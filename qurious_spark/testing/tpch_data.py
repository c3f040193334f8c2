"""Generate reference-schema TPC-H ``.tbl`` files from the driver testdata.

The reference gates its tpch.slt corpus on dbgen-generated ``.tbl`` files
that ship with neither repo (reference Makefile:23-36 produces them via
docker). This module deterministically derives equivalent pipe-delimited
files from ``/root/testdata/sf*`` parquet so the reference's
create_tables/insert/q1-q12/drop slt pipeline
(/root/reference/qurious/tests/tpch/) runs end-to-end, with DuckDB loaded
from the SAME files recomputing every query's expected block (the inline
goldens are dbgen-data-specific and unreproducible without dbgen).

Value remapping — the testdata's reduced domains would make most reference
predicates vacuous, so generated columns land in dbgen's domains:

- ``n_name``: NATION_i -> the real 25 TPC-H nation names, region-consistent
  (FRANCE/GERMANY/... land in EUROPE etc.), so q7/q8/q11's nation literals
  select rows;
- ``p_type``: the testdata single word (already dbgen's first component) is
  extended to the 3-word dbgen form (ECONOMY ANODIZED STEEL, ...), so
  ``like '%BRASS'`` and the exact q8 type match;
- ``p_name``: five dbgen color words keyed off p_partkey, so ``'%green%'``
  (q9) matches a deterministic subset;
- dates: shifted back 3 years (testdata spans 1995-2001; dbgen queries
  probe 1993-1996), so every date window is non-empty;
- ``l_commitdate``/``l_receiptdate``/``l_shipmode``/``o_shippriority`` and
  the address/phone/comment/mfgr columns the testdata lacks are synthesized
  deterministically from keys;
- ``partsupp`` is derived 4-rows-per-part with the same integer formulas as
  queries/partsupp.py's PARTSUPP_CTE.

Every row ends with a trailing ``|`` exactly like dbgen output — the
reference schemas' ``*_rev VARCHAR`` final column captures that empty
field (create_tables.slt).
"""

from __future__ import annotations

import os

# Real TPC-H nations grouped by their region (TPC-H spec 4.2.3), assigned
# region-consistently to the testdata's 5-per-region round-robin layout.
NATIONS_BY_REGION = {
    "AFRICA": ["ALGERIA", "ETHIOPIA", "KENYA", "MOROCCO", "MOZAMBIQUE"],
    "AMERICA": ["ARGENTINA", "BRAZIL", "CANADA", "PERU", "UNITED STATES"],
    "ASIA": ["CHINA", "INDIA", "INDONESIA", "JAPAN", "VIETNAM"],
    "EUROPE": ["FRANCE", "GERMANY", "ROMANIA", "RUSSIA", "UNITED KINGDOM"],
    "MIDDLE EAST": ["EGYPT", "IRAN", "IRAQ", "JORDAN", "SAUDI ARABIA"],
}
TYPE_SYLL2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_SYLL3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
COLORS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black",
    "blanched", "blue", "blush", "brown", "burlywood", "burnished", "chartreuse",
    "chiffon", "chocolate", "green",
]
# single-token stand-ins for dbgen's multi-word lists (never matched by
# q1-q12 predicates except MAIL/SHIP, which are preserved verbatim)
SHIPMODES = ["REGAIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]

TABLES = (
    "region", "nation", "supplier", "part", "partsupp",
    "customer", "orders", "lineitem",
)


def _read(sf_dir: str, name: str):
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet")).to_pandas()


def _shift_date(ts):
    """timestamp series -> DATE string series, shifted back 3 years."""
    import pandas as pd

    return (pd.to_datetime(ts) - pd.DateOffset(years=3)).dt.strftime("%Y-%m-%d")


def _write_tbl(path: str, columns) -> None:
    """Pipe-delimited rows with dbgen's trailing '|' (empty _rev field)."""
    cols = [c.astype(str) for c in columns]
    with open(path, "w") as f:
        for row in zip(*cols):
            f.write("|".join(row) + "|\n")


def _money(series):
    return series.map(lambda v: f"{float(v):.2f}")


def generate(sf_dir: str, out_dir: str) -> str:
    """Write all 8 .tbl files derived from ``sf_dir`` parquet; idempotent."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    region = _read(sf_dir, "region").sort_values("r_regionkey")
    _write_tbl(
        os.path.join(out_dir, "region.tbl"),
        [region.r_regionkey, region.r_name,
         "rcomment" + region.r_regionkey.astype(str)],
    )

    nation = _read(sf_dir, "nation").sort_values("n_nationkey").reset_index(drop=True)
    region_names = dict(zip(region.r_regionkey, region.r_name))
    used: dict[int, int] = {}
    real_names = []
    for rk in nation.n_regionkey:
        i = used.get(rk, 0)
        used[rk] = i + 1
        real_names.append(NATIONS_BY_REGION[region_names[rk]][i])
    nation["real_name"] = real_names
    _write_tbl(
        os.path.join(out_dir, "nation.tbl"),
        [nation.n_nationkey, nation.real_name, nation.n_regionkey,
         "ncomment" + nation.n_nationkey.astype(str)],
    )

    sup = _read(sf_dir, "supplier").sort_values("s_suppkey")
    k = sup.s_suppkey
    _write_tbl(
        os.path.join(out_dir, "supplier.tbl"),
        [k, sup.s_name, "saddr" + k.astype(str), sup.s_nationkey,
         "27-" + (k % 900 + 100).astype(str) + "-" + (k % 9000 + 1000).astype(str),
         _money(sup.s_acctbal), "scomment" + k.astype(str)],
    )

    part = _read(sf_dir, "part").sort_values("p_partkey")
    pk = part.p_partkey
    p_name = (
        pd.Series([COLORS[i % 17] for i in pk], index=pk.index)
        + " " + pd.Series([COLORS[(i * 3 + 5) % 17] for i in pk], index=pk.index)
        + " " + pd.Series([COLORS[(i * 7 + 11) % 17] for i in pk], index=pk.index)
    )
    p_type = (
        part.p_type
        + " " + pd.Series([TYPE_SYLL2[(i * 3 + 1) % 5] for i in pk], index=pk.index)
        + " " + pd.Series([TYPE_SYLL3[(i * 7 + 2) % 5] for i in pk], index=pk.index)
    )
    _write_tbl(
        os.path.join(out_dir, "part.tbl"),
        [pk, p_name, "Manufacturer#" + (pk % 5 + 1).astype(str), part.p_brand,
         p_type, part.p_size, "CONT" + (pk % 40).astype(str),
         _money(part.p_retailprice), "pcomment" + pk.astype(str)],
    )

    # partsupp: same derivation as queries/partsupp.py PARTSUPP_CTE
    n_supp = len(sup)
    ps = pd.concat(
        [
            pd.DataFrame(
                {
                    "ps_partkey": pk,
                    "ps_suppkey": (pk * 7 + kk * 13) % n_supp,
                    "ps_availqty": (pk * 13 + kk * 5) % 9999 + 1,
                    "ps_supplycost": ((pk * 31 + kk * 7) % 10000 + 100) / 100.0,
                }
            )
            for kk in range(4)
        ]
    ).sort_values(["ps_partkey", "ps_suppkey"])
    _write_tbl(
        os.path.join(out_dir, "partsupp.tbl"),
        [ps.ps_partkey, ps.ps_suppkey, ps.ps_availqty,
         _money(ps.ps_supplycost),
         "pscomment" + ps.ps_partkey.astype(str) + "_" + ps.ps_suppkey.astype(str)],
    )

    cust = _read(sf_dir, "customer").sort_values("c_custkey")
    ck = cust.c_custkey
    _write_tbl(
        os.path.join(out_dir, "customer.tbl"),
        [ck, cust.c_name, "caddr" + ck.astype(str), cust.c_nationkey,
         "13-" + (ck % 900 + 100).astype(str) + "-" + (ck % 9000 + 1000).astype(str),
         _money(cust.c_acctbal), cust.c_mktsegment, "ccomment" + ck.astype(str)],
    )

    orders = _read(sf_dir, "orders").sort_values("o_orderkey")
    ok = orders.o_orderkey
    _write_tbl(
        os.path.join(out_dir, "orders.tbl"),
        [ok, orders.o_custkey, orders.o_orderstatus, _money(orders.o_totalprice),
         _shift_date(orders.o_orderdate), orders.o_orderpriority,
         "Clerk#" + (ok % 1000).astype(str), pd.Series(0, index=ok.index),
         "ocomment" + ok.astype(str)],
    )

    li = _read(sf_dir, "lineitem").sort_values(["l_orderkey", "l_linenumber"])
    lok, ln = li.l_orderkey, li.l_linenumber
    ship = pd.to_datetime(li.l_shipdate) - pd.DateOffset(years=3)
    commit = ship + pd.to_timedelta((lok * 5 + ln) % 61 - 30, unit="D")
    receipt = ship + pd.to_timedelta((lok * 3 + ln) % 30 + 1, unit="D")
    _write_tbl(
        os.path.join(out_dir, "lineitem.tbl"),
        [lok, li.l_partkey, li.l_suppkey, ln,
         _money(li.l_quantity), _money(li.l_extendedprice),
         _money(li.l_discount), _money(li.l_tax),
         li.l_returnflag, li.l_linestatus,
         ship.dt.strftime("%Y-%m-%d"), commit.dt.strftime("%Y-%m-%d"),
         receipt.dt.strftime("%Y-%m-%d"),
         "INSTR" + ((lok + ln) % 4).astype(str),
         pd.Series([SHIPMODES[int(i) % 7] for i in (lok * 3 + ln)], index=lok.index),
         "lcomment" + lok.astype(str) + "_" + ln.astype(str)],
    )
    return out_dir


# DuckDB column specs matching create_tables.slt exactly (incl. _rev).
_DUCK_SCHEMAS = {
    "supplier": {
        "s_suppkey": "BIGINT", "s_name": "VARCHAR", "s_address": "VARCHAR",
        "s_nationkey": "BIGINT", "s_phone": "VARCHAR",
        "s_acctbal": "DECIMAL(15,2)", "s_comment": "VARCHAR", "s_rev": "VARCHAR",
    },
    "part": {
        "p_partkey": "BIGINT", "p_name": "VARCHAR", "p_mfgr": "VARCHAR",
        "p_brand": "VARCHAR", "p_type": "VARCHAR", "p_size": "INTEGER",
        "p_container": "VARCHAR", "p_retailprice": "DECIMAL(15,2)",
        "p_comment": "VARCHAR", "p_rev": "VARCHAR",
    },
    "partsupp": {
        "ps_partkey": "BIGINT", "ps_suppkey": "BIGINT", "ps_availqty": "INTEGER",
        "ps_supplycost": "DECIMAL(15,2)", "ps_comment": "VARCHAR", "ps_rev": "VARCHAR",
    },
    "customer": {
        "c_custkey": "BIGINT", "c_name": "VARCHAR", "c_address": "VARCHAR",
        "c_nationkey": "BIGINT", "c_phone": "VARCHAR", "c_acctbal": "DECIMAL(15,2)",
        "c_mktsegment": "VARCHAR", "c_comment": "VARCHAR", "c_rev": "VARCHAR",
    },
    "orders": {
        "o_orderkey": "BIGINT", "o_custkey": "BIGINT", "o_orderstatus": "VARCHAR",
        "o_totalprice": "DECIMAL(15,2)", "o_orderdate": "DATE",
        "o_orderpriority": "VARCHAR", "o_clerk": "VARCHAR",
        "o_shippriority": "INTEGER", "o_comment": "VARCHAR", "o_rev": "VARCHAR",
    },
    "lineitem": {
        "l_orderkey": "BIGINT", "l_partkey": "BIGINT", "l_suppkey": "BIGINT",
        "l_linenumber": "INTEGER", "l_quantity": "DECIMAL(15,2)",
        "l_extendedprice": "DECIMAL(15,2)", "l_discount": "DECIMAL(15,2)",
        "l_tax": "DECIMAL(15,2)", "l_returnflag": "VARCHAR",
        "l_linestatus": "VARCHAR", "l_shipdate": "DATE", "l_commitdate": "DATE",
        "l_receiptdate": "DATE", "l_shipinstruct": "VARCHAR",
        "l_shipmode": "VARCHAR", "l_comment": "VARCHAR", "l_rev": "VARCHAR",
    },
    "nation": {
        "n_nationkey": "BIGINT", "n_name": "VARCHAR", "n_regionkey": "BIGINT",
        "n_comment": "VARCHAR", "n_rev": "VARCHAR",
    },
    "region": {
        "r_regionkey": "BIGINT", "r_name": "VARCHAR",
        "r_comment": "VARCHAR", "r_rev": "VARCHAR",
    },
}


def load_duckdb(tbl_dir: str):
    """Fresh DuckDB connection with the 8 tables loaded from ``tbl_dir``
    under the reference create_tables.slt schemas — the oracle side of the
    tpch slt gate."""
    import duckdb

    con = duckdb.connect()
    for t, cols in _DUCK_SCHEMAS.items():
        spec = ", ".join(f"'{c}': '{ty}'" for c, ty in cols.items())
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM read_csv("
            f"'{os.path.join(tbl_dir, t)}.tbl', delim='|', header=false, "
            f"columns={{{spec}}})"
        )
    return con


if __name__ == "__main__":
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/qurious_tpch_tbl"
    print(generate(sf, out))

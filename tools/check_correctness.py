"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it
against the matching ``oracle_sql()`` executed by DuckDB on the same parquet
tables: row count, column names, and an order-insensitive value comparison
(columns sorted by name, rows sorted, floats compared after rounding).

Usage:
    python tools/check_correctness.py [--sf DIR] [--only NAME[,NAME...]]
"""

from __future__ import annotations

import argparse
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    # TZ-independence gate: pin the oracle to the same session zone as
    # Spark (affects DuckDB's TIMESTAMPTZ display/arithmetic only; the
    # testdata's naive timestamp[us] columns are zone-independent on both
    # engines, which is exactly what the gate proves).
    tz = os.environ.get("SPARK_GRAFT_SESSION_TZ")
    if tz:
        con.execute(f"SET TimeZone='{tz}'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written table: a directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'")
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    # datetimes/dates/decimals: compare via str
    if hasattr(v, "isoformat"):
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 6)
    return v


def frame_key(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(normalize_cell(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [columns[i] for i in order], out


def _canon_type(t: str) -> str:
    """Collapse Spark dtypes and DuckDB type names into one canonical
    vocabulary so representation drift (the class the driver's value-hash is
    sensitive to, e.g. DuckDB widening integer SUM to HUGEINT while Spark
    stays BIGINT) fails locally instead of only on the driver."""
    t = t.strip().lower()
    m = re.match(r"(.+)\[\]$", t)  # duckdb list syntax
    if m:
        return f"list<{_canon_type(m.group(1))}>"
    m = re.match(r"array<(.+)>$", t)  # spark list syntax
    if m:
        return f"list<{_canon_type(m.group(1))}>"
    m = re.match(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
    if m:
        return f"dec({m.group(1)},{m.group(2)})"
    table = {
        "tinyint": "int8",
        "smallint": "int16",
        "int": "int32",
        "integer": "int32",
        "bigint": "int64",
        "hugeint": "int128",
        "utinyint": "uint8",
        "usmallint": "uint16",
        "uinteger": "uint32",
        "ubigint": "uint64",
        "float": "f32",
        "real": "f32",
        "double": "f64",
        "varchar": "str",
        "string": "str",
        "text": "str",
        "boolean": "bool",
        "blob": "bin",
        "binary": "bin",
        "date": "date",
        "timestamp": "ts",
        "timestamp_ntz": "ts",
        "timestamp with time zone": "ts",
        "timestamptz": "ts",
    }
    return table.get(t, t)


def compare(name, spark_df, con, sql):
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_types = [str(t) for t in rel.types]
    duck_rows = rel.fetchall()

    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    else:
        s_types = {c: _canon_type(t) for c, t in spark_df.dtypes}
        d_types = {c: _canon_type(t) for c, t in zip(duck_cols, duck_types)}
        drift = {
            c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types[c]
        }
        if drift:
            problems.append(
                "type drift (driver hash is representation-sensitive): "
                + ", ".join(f"{c}: spark={a} duck={b}" for c, (a, b) in drift.items())
            )
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    if not problems:
        _, s_rows = frame_key(spark_cols, spark_rows)
        _, d_rows = frame_key(duck_cols, duck_rows)
        mismatches = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ]
        if mismatches:
            i, a, b = mismatches[0]
            problems.append(
                f"{len(mismatches)}/{len(s_rows)} rows differ; first at sorted-row {i}:\n"
                f"    spark: {a}\n    duck : {b}"
            )
    return problems, len(duck_rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from qurious_spark.session import get_spark

    spark = get_spark()
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    con = duckdb_conn(args.sf)
    n_pass = n_fail = n_rows_only = 0
    vacuous: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, args.sf)
            if name not in oracles:
                cnt = df.count()
                print(f"ROWSONLY {name}: {cnt} rows ({time.time()-t0:.1f}s)")
                n_rows_only += 1
                continue
            problems, oracle_rows = compare(name, df, con, oracles[name])
            # a 0-row agreement proves nothing (the tpch_q9/left-anti
            # lesson): surface it so vacuous greens get fixed, not trusted
            # (row count comes back from compare() — re-running the oracle
            # SQL here would double every passing query's oracle runtime)
            if not problems and oracle_rows == 0:
                vacuous.append(name)
        except Exception as e:
            problems = [f"EXCEPTION {type(e).__name__}: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"  - {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if vacuous:
        print(f"VACUOUS (0-row green, proves nothing): {', '.join(vacuous)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""NULL-payload robustness sweep: run every registry query against a copy
of the dataset where ~20% of payload values (strings and doubles — NOT
keys, ids, or timestamps) are NULL.

Complements tools/empty_sweep.py: the oracle gate's testdata carries no
NULL text/values, so operators that assume non-null payloads (shingling a
NULL document, quality-scoring a NULL body, summing an all-NULL metric)
would pass the gate and fall over in production, where sparse payloads
are routine at scale. Keys/ids/timestamps stay intact so join topology,
watermarks, and bucketing remain well-defined — this sweep tests payload
null-tolerance, not referential integrity.

The nulling is deterministic (md5 of the row's first column), so failures
reproduce. Usage: python tools/null_sweep.py [--only a,b] [--frac 0.2]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Same contract as empty_sweep: justified guards, not crashes.
EXPECTED_RAISES: dict[str, str] = {}

# payload columns eligible for nulling, per table: strings and doubles
# whose absence a pipeline must tolerate. Never keys/ids/timestamps
# (referential integrity and event time stay intact), and never
# embeddings (a NULL vector is a different contract — the ANN operators
# document non-null input; a null-embedding variant would test a guard,
# not tolerance).
_NULLABLE: dict[str, list[str]] = {
    "documents": ["text", "lang", "source"],
    "events": ["event_type", "value", "props"],
    "lineitem": ["l_returnflag", "l_linestatus"],
    "customer": ["c_name", "c_mktsegment", "c_acctbal"],
    "orders": ["o_orderstatus", "o_orderpriority", "o_comment"],
    "part": ["p_name", "p_type", "p_comment"],
    "supplier": ["s_name", "s_comment"],
}


def build_nulled_dataset(spark, src_sf: str, frac: float = 0.2) -> str:
    from pyspark.sql import functions as F

    from qurious_spark.sources.readers import TPCH_TABLES, read_parquet

    out = tempfile.mkdtemp(prefix="qurious_null_sf_")
    mod = max(2, int(round(1 / frac)))
    for t in TPCH_TABLES:
        df = read_parquet(spark, os.path.join(src_sf, f"{t}.parquet"))
        first = df.columns[0]
        for c in _NULLABLE.get(t, []):
            if c not in df.columns:
                continue
            # deterministic per (row, column): null where the md5 slot hits
            gate = (
                F.pmod(
                    F.abs(F.hash(F.col(first).cast("string"), F.lit(c))),
                    F.lit(mod),
                )
                == 0
            )
            df = df.withColumn(c, F.when(gate, F.lit(None)).otherwise(F.col(c)))
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--frac", type=float, default=0.2)
    ap.add_argument("--only", default=None)
    args = ap.parse_args(argv)

    from qurious_spark.queries import REGISTRY, ordered_registry
    from qurious_spark.session import get_spark

    spark = get_spark()
    nulled_sf = build_nulled_dataset(spark, args.sf, args.frac)
    names = list(ordered_registry())
    if args.only:
        only = set(args.only.split(","))
        names = [n for n in names if n in only]

    failures: list[tuple[str, str]] = []
    for name in names:
        try:
            rows = REGISTRY[name](spark, nulled_sf).collect()
            print(f"PASS {name} ({len(rows)} rows)")
        except Exception as e:  # noqa: BLE001 - the sweep's whole point
            if name in EXPECTED_RAISES:
                print(f"GUARD {name} ({type(e).__name__}: {e})")
                continue
            msg = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            failures.append((name, msg))
            print(f"RAISE {name} ({msg})")
    print(f"\n{len(names) - len(failures)} pass, {len(failures)} raise")
    for name, msg in failures:
        print(f"  {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

"""Empty-input robustness sweep: run every registry query against a
dataset of the same schemas with ZERO rows.

The oracle gate (tools/check_correctness.py) always runs at sf0.01, so a
query that crashes on an empty table — .collect()[0] on an empty
aggregate, max() of nothing, div-by-zero on a count — would never be
caught. At 100 TB empty inputs are routine (an empty partition, a
filtered-out date range, a cold-start streaming table), so every operator
must degrade to an empty (or scalar-default) result, not a stack trace.

Usage: python tools/empty_sweep.py [--only a,b] [--sf /root/testdata/sf0.001]
Writes nothing; prints one line per entry and a summary. Exit 1 on any
unexpected raise (entries listed in EXPECTED_RAISES are allowed to refuse
empty input with a clear ValueError by design).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Entries whose contract explicitly REFUSES degenerate input with a typed
# error (guards, not crashes). Keep this list justified per entry.
EXPECTED_RAISES: dict[str, str] = {
    # NDJSON is schemaless: a 0-row corpus writes no records, so read_json
    # has nothing to infer a schema from and the roundtrip's projection
    # cannot resolve. Inherent to the format (DuckDB's read_json errors on
    # the same input); parquet/ORC/CSV-with-header roundtrips all pass the
    # sweep because their files carry schema even at 0 rows.
    "source_ndjson_roundtrip": "schemaless format, no rows to infer from",
}


def build_empty_dataset(spark, src_sf: str) -> str:
    """Write a 0-row parquet per table, with the source scale's schemas."""
    out = tempfile.mkdtemp(prefix="qurious_empty_sf_")
    from qurious_spark.sources.readers import TPCH_TABLES, read_parquet

    for t in TPCH_TABLES:
        df = read_parquet(spark, os.path.join(src_sf, f"{t}.parquet"))
        df.limit(0).write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args(argv)

    from qurious_spark.queries import REGISTRY, ordered_registry
    from qurious_spark.session import get_spark

    spark = get_spark()
    empty_sf = build_empty_dataset(spark, args.sf)
    names = list(ordered_registry())
    if args.only:
        only = set(args.only.split(","))
        names = [n for n in names if n in only]

    failures: list[tuple[str, str]] = []
    for name in names:
        try:
            rows = REGISTRY[name](spark, empty_sf).collect()
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

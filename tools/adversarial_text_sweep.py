"""Adversarial-text robustness sweep: documents.text replaced with
pathological payloads for ~15% of rows, then every registry query runs.

Targets the text/dedup/winnow/vocab families: empty strings,
whitespace-only bodies, control characters, combining-mark unicode, and
a single unbroken multi-kilobyte token — shapes that appear constantly in
web-crawl corpora and that the synthetic testdata never contains.
Shingling, winnowing, tokenization, and quality scoring must degrade
(empty output, zero scores), not raise; the unbroken token also canaries
the higher-order-function recompute hazard (SCALE.md): a quadratic gram
builder would visibly hang on it.

Deterministic (doc_id-keyed). Usage:
python tools/adversarial_text_sweep.py [--only a,b]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_RAISES: dict[str, str] = {}

_PATHOLOGICAL = [
    "",  # empty body
    "   \t  \n  ",  # whitespace-only
    "a\x00b\x01c control\x07chars",  # control characters
    "é" * 40 + " cómbining áccents " + "ñ" * 40,  # non-ASCII + combining
    "x" * 4000,  # one unbroken 4k token (HOF-recompute canary)
    "word " * 1,  # near-empty
]


def build_adversarial_dataset(spark, src_sf: str) -> str:
    from pyspark.sql import functions as F

    from qurious_spark.sources.readers import TPCH_TABLES, read_parquet

    out = tempfile.mkdtemp(prefix="qurious_advtext_sf_")
    for t in TPCH_TABLES:
        df = read_parquet(spark, os.path.join(src_sf, f"{t}.parquet"))
        if t == "documents":
            # doc_id % 40 picks ~15% of rows (6 variants / 40 slots),
            # deterministic and disjoint per variant
            repl = None
            for i, s in enumerate(_PATHOLOGICAL):
                cond = F.pmod(F.col("doc_id"), F.lit(40)) == i
                repl = F.when(cond, F.lit(s)) if repl is None else repl.when(cond, F.lit(s))
            df = df.withColumn("text", repl.otherwise(F.col("text")))
            # keep n_chars consistent with the new text where entries use it
            df = df.withColumn("n_chars", F.length(F.coalesce(F.col("text"), F.lit(""))))
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args(argv)

    from qurious_spark.queries import REGISTRY, ordered_registry
    from qurious_spark.session import get_spark

    spark = get_spark()
    adv_sf = build_adversarial_dataset(spark, args.sf)
    names = list(ordered_registry())
    if args.only:
        only = set(args.only.split(","))
        names = [n for n in names if n in only]

    failures: list[tuple[str, str]] = []
    for name in names:
        try:
            rows = REGISTRY[name](spark, adv_sf).collect()
            print(f"PASS {name} ({len(rows)} rows)", flush=True)
        except Exception as e:  # noqa: BLE001 - the sweep's whole point
            if name in EXPECTED_RAISES:
                print(f"GUARD {name} ({type(e).__name__}: {e})", flush=True)
                continue
            msg = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            failures.append((name, msg))
            print(f"RAISE {name} ({msg})", flush=True)
    print(f"\n{len(names) - len(failures)} pass, {len(failures)} raise")
    for name, msg in failures:
        print(f"  {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

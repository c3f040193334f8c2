"""Source-text lints for the oracle-stability conventions in
qurious_spark/queries/__init__.py's docstring.

These catch regressions of defect classes that only fire at scale, where
the default-suite gates can't see them (the money-sum half-point class
first flipped at sf1 — tpch_q7, round 7).
"""

from __future__ import annotations

import glob
import os

QUERIES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "qurious_spark",
    "queries",
)


def _round_spans(text: str):
    """Yield (offset, span_text) for every balanced ROUND(...) call."""
    upper = text.upper()
    start = 0
    while True:
        i = upper.find("ROUND(", start)
        if i < 0:
            return
        depth = 0
        for j in range(i + 5, len(text)):
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
                if depth == 0:
                    yield i, text[i : j + 1]
                    break
        start = i + 6


def test_no_double_round_over_decimal_sums():
    """Money sums must round in DECIMAL space (CAST(ROUND(SUM(dec), n) AS
    DOUBLE)), never ROUND a double-cast sum: an exact scale-4 decimal sum
    ends on a .xx5 half-point ~1/100 groups, where Spark (shortest decimal
    string, HALF_UP) and DuckDB (binary value) round a DOUBLE apart.
    Quotients are exempt — they are covered by the DECIMAL(38,k) cast
    convention (DuckDB types decimal division as DOUBLE and rounds the
    double→decimal cast)."""
    bad = []
    for path in glob.glob(os.path.join(QUERIES_DIR, "*.py")):
        if os.path.basename(path) == "__init__.py":
            continue  # the conventions docstring quotes the anti-pattern
        text = open(path).read()
        for off, span in _round_spans(text):
            if "CAST(SUM" in span and "AS DOUBLE" in span and "/" not in span:
                line = text[:off].count("\n") + 1
                bad.append(f"{os.path.basename(path)}:{line}: {span[:90]}")
    assert not bad, (
        "ROUND over a double-cast decimal SUM (half-point hazard; use "
        "CAST(ROUND(SUM(dec), n) AS DOUBLE)):\n" + "\n".join(bad)
    )


def test_no_dataframe_round_over_double_cast():
    """DataFrame-API twin of the SQL lint: F.round(x.cast(\"double\"), n)
    rounds a DOUBLE (engine-divergent on half-points); round the decimal
    first, then cast — F.round(x, n).cast(\"double\")."""
    bad = []
    for path in glob.glob(os.path.join(QUERIES_DIR, "*.py")):
        text = open(path).read()
        start = 0
        while True:
            i = text.find("F.round(", start)
            if i < 0:
                break
            depth = 0
            for j in range(i + 7, len(text)):
                if text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                    if depth == 0:
                        span = text[i : j + 1]
                        if '.cast("double")' in span:
                            line = text[:i].count("\n") + 1
                            bad.append(f"{os.path.basename(path)}:{line}")
                        break
            start = i + 8
    assert not bad, (
        "F.round over a double cast (half-point hazard; use "
        'F.round(dec, n).cast("double")):\n' + "\n".join(bad)
    )


def test_rdd_access_is_metadata_only_in_spread():
    """``.rdd`` builds RDD lineage and escapes whole-stage codegen — the
    package's single allowed use is spread()'s driver-side
    ``getNumPartitions()`` probe (round-8 judge hardening note). Any new
    ``.rdd`` access must be justified here."""
    import re

    pkg = os.path.join(os.path.dirname(QUERIES_DIR))
    hits = []
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, pkg)
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                code = line.split("#", 1)[0]
                if re.search(r"\.rdd\b", code) and '``' not in line:
                    hits.append((rel, lineno, line.strip()))
    allowed = {("operators/dedup.py", "nparts = df.rdd.getNumPartitions()")}
    unexpected = [
        h for h in hits if (h[0], h[2]) not in allowed
    ]
    assert not unexpected, f"new .rdd access outside spread(): {unexpected}"
    assert len(hits) == 1, f"expected exactly the spread() probe, got: {hits}"

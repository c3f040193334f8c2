"""Plan audit enforcement: no scale anti-patterns in any registry query.

Executes every queries() entry at sf0.001 and lints the final (post-AQE)
physical plan: unexpected cartesian products / broadcast-nested-loop joins,
Python eval stages outside the sanctioned Python-backed operators, and plans
that never enter whole-stage codegen.
"""

from __future__ import annotations

import pytest

from qurious_spark.plans.audit import audit_registry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def report(spark):
    return audit_registry(spark, SF_DIR)


@pytest.mark.slow
def test_registry_has_no_plan_violations(report):
    assert report.info, "no queries audited"
    assert report.ok, "\n".join(
        f"{f.query}: {f.kind} ({f.detail})" for f in report.findings
    )


@pytest.mark.slow
def test_scans_are_column_pruned(report):
    # every parquet scan projects a narrow column subset (ReadSchema pruning);
    # lineitem/documents are 16/5 columns wide — a scan that reads everything
    # for a narrow query means pruning broke.
    wide = {
        name: info["scan_widths"]
        for name, info in report.info.items()
        if any(w > 8 for w in info["scan_widths"])
    }
    assert not wide, f"scans reading >8 columns: {wide}"


def test_wide_scale0_decimal_hazard_class():
    """Round-7 advisor finding: the driver-hash hazard is the CLASS of
    scale-0 decimals wider than int64 (p > 18), not the literal
    decimal(20,0) string parquet uint64 happens to map to."""
    from qurious_spark.plans.audit import _is_wide_scale0_decimal

    assert _is_wide_scale0_decimal("decimal(20,0)")
    assert _is_wide_scale0_decimal("decimal(21,0)")
    assert _is_wide_scale0_decimal("decimal(38,0)")
    assert not _is_wide_scale0_decimal("decimal(18,0)")  # fits int64-stable range
    assert not _is_wide_scale0_decimal("decimal(38,4)")  # scaled decimals canonicalize
    assert not _is_wide_scale0_decimal("bigint")

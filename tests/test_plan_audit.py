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


def test_registry_has_no_plan_violations(report):
    assert report.info, "no queries audited"
    assert report.ok, "\n".join(
        f"{f.query}: {f.kind} ({f.detail})" for f in report.findings
    )


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

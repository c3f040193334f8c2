"""Test-harness utilities: the sqllogictest-style runner (slt module)."""

from qurious_spark.testing.slt import parse_slt_file, run_slt_file, SltResult

__all__ = ["parse_slt_file", "run_slt_file", "SltResult"]

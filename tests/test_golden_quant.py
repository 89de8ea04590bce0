"""Differential test: quantifier EM output vs reference centrifuger-quant."""

import io
import os
import sys

import pytest

from conftest import FIXTURE_DIR

FX = os.path.join(FIXTURE_DIR, "small")


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    from centrifuger_tpu.build import build_index
    out = tmp_path_factory.mktemp("idx")
    prefix = str(out / "idx")
    build_index([os.path.join(FX, "ref.fa")],
                os.path.join(FX, "nodes.dmp"),
                os.path.join(FX, "names.dmp"),
                os.path.join(FX, "ref_seqid.map"),
                conversion_at_file_level=False,
                output_prefix=prefix)
    return prefix


@pytest.mark.parametrize("fmt,golden", [(0, "golden_quant_centrifuger.tsv"),
                                        (3, "golden_quant_kreport.tsv")])
def test_quant_matches_reference(built_index, fmt, golden):
    from centrifuger_tpu.quant.quantifier import Quantifier
    q = Quantifier()
    q.init_from_index(built_index)
    q.load_read_assignments(os.path.join(FX, "golden_class_k1.tsv"))
    q.quantification()
    buf = io.StringIO()
    q.output(buf, fmt)
    with open(os.path.join(FX, golden)) as f:
        want = f.read()
    got_lines = buf.getvalue().splitlines()
    want_lines = want.splitlines()
    assert len(got_lines) == len(want_lines)
    for i, (g, w) in enumerate(zip(got_lines, want_lines)):
        assert g == w, "line %d differs:\n  got:  %s\n  want: %s" % (i, g, w)

"""Offline tests for the database-prep tooling parsing cores."""

import io
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "indices"))


def test_silva_dmps():
    from silva_download import prepare_dmps, convert_fasta
    tax = [
        "Archaea;\t2\tdomain\t\t\n",
        "Archaea;Aenigmarchaeota;\t11084\tphylum\t123\t\n",
        "Archaea;Aenigmarchaeota;Aenigmarchaeia;\t11085\tclass\t\t\n",
    ]
    nodes = io.StringIO()
    names = io.StringIO()
    prepare_dmps(tax, nodes, names)
    nl = nodes.getvalue().splitlines()
    assert nl[0] == "1\t|\t1\t|\tno rank\t|"
    assert "2\t|\t1\t|\tdomain\t|" in nl
    assert "11084\t|\t2\t|\tphylum\t|" in nl
    assert "11085\t|\t11084\t|\tclass\t|" in nl
    assert "11084\t|\tAenigmarchaeota\t|\tscientific name\t|" in \
        names.getvalue().splitlines()
    fa_in = io.StringIO(">ACC1.1.100 Archaea;Foo\nAUGUCU\n>A2 x\nGGUU\n")
    fa_out = io.StringIO()
    convert_fasta(fa_in, fa_out)
    assert fa_out.getvalue() == ">ACC1.1.100\nATGTCT\n>A2\nGGTT\n"


def test_gtdb_create_dmp(tmp_path):
    from gtdb_create_dmp import create_dmps
    meta = [
        "accession\tgtdb_representative\tgtdb_taxonomy\n",
        "RS_GCF_000001.1\tt\td__Bacteria;p__Px;c__Cx;o__Ox;f__Fx;g__Gx;s__Gx species1\n",
        "RS_GCF_000002.1\tf\td__Bacteria;p__Px;c__Cx;o__Ox;f__Fx;g__Gx;s__Gx species2\n",
        "RS_GCF_000003.1\tt\td__Bacteria;p__Py;c__Cy;o__Oy;f__Fy;g__Gy;s__Gy species3\n",
    ]
    prefix = str(tmp_path / "g")
    fmap = create_dmps(meta, "/data", prefix, ncbi_names={"Bacteria": "2"})
    assert len(fmap) == 2  # only representatives
    nodes = open(prefix + "_nodes.dmp").read()
    names = open(prefix + "_names.dmp").read()
    assert "2\t|\t1\t|\tdomain\t|" in nodes
    assert "Gx_species1" not in names  # names keep spaces as-is? (underscored on read)
    assert "10000000\t|\t2\t|\tphylum\t|" in nodes
    files = open(prefix + "_file.list").read().splitlines()
    assert files[0].endswith("GCF_000001.1_genomic.fna.gz")
    assert "/database/GCF/000/001/.1_" not in files[0]


def test_search_accession(tmp_path):
    seqlist = tmp_path / "s.list"
    seqlist.write_text("ACC1.1\nACC2.3\nNOPE.9\n")
    amap = tmp_path / "a.map"
    amap.write_text("ACC1\tACC1.1\t500\t0\nACC2\tACC2.3\t600\t0\n")
    out = subprocess.run([sys.executable, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "indices", "search_accession_to_taxid.py"),
        str(seqlist), str(amap)], capture_output=True, check=True)
    assert out.stdout.decode() == "ACC1.1\t500\nACC2.3\t600\nNOPE.9\t1\n"

#!/usr/bin/env python3
"""Download + prepare the SILVA rRNA database for cfr-build.

Python port of the reference's indices/silva-download.pl: fetches the SILVA
taxonomy export, writes nodes.dmp/names.dmp (parent resolved by lineage-prefix
name), the accession->taxid map, and the genome fasta with U->T conversion.

The parsing stages are importable (prepare_dmps / convert_fasta) so they can
run on local files without network access.
"""

import argparse
import gzip
import os
import sys
import urllib.request


def log(msg):
    sys.stderr.write(msg + "\n")


def prepare_dmps(tax_lines, nodes_out, names_out):
    """tax_lines: iterable of SILVA tax_slv lines
    ('Archaea;Aenigmarchaeota;\t11084\tphylum\t...'). Writes dmp files."""
    name_map = {}
    rows = []
    names_out.write("1\t|\troot\t|\tscientific name\t|\n")
    for line in tax_lines:
        line = line.rstrip("\n")
        if not line:
            continue
        cols = line.split("\t")
        name_cols = cols[0].split(";")
        # trailing ';' produces an empty last element
        while name_cols and name_cols[-1] == "":
            name_cols.pop()
        name = name_cols[-1]
        tax = cols[1]
        name_map[name] = tax
        names_out.write("%s\t|\t%s\t|\tscientific name\t|\n" % (tax, name))
        rows.append((cols, name_cols))
    nodes_out.write("1\t|\t1\t|\tno rank\t|\n")
    for cols, name_cols in rows:
        tax = cols[1]
        parent = "1"
        if len(name_cols) > 1:
            parent = name_map.get(name_cols[-2], "1")
        nodes_out.write("%s\t|\t%s\t|\t%s\t|\n" % (tax, parent, cols[2]))


def convert_fasta(in_stream, out_stream):
    """Strip headers to the accession token and convert U->T."""
    for line in in_stream:
        line = line.rstrip("\n")
        if line.startswith(">"):
            out_stream.write(line.split()[0] + "\n")
        else:
            out_stream.write(line.replace("U", "T") + "\n")


def fetch(url, dest):
    log("downloading %s" % url)
    urllib.request.urlretrieve(url, dest)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-v", dest="version", default="138.1")
    ap.add_argument("-o", dest="outdir", default="./")
    ap.add_argument("--subunit", default="SSU", choices=["SSU", "LSU"])
    ap.add_argument("--NR99", type=int, default=1)
    args = ap.parse_args()

    under = args.version.replace(".", "_")
    web = ("https://www.arb-silva.de/fileadmin/silva_databases/"
           "release_%s/Exports" % under)
    prefix = "tax_slv_%s_%s" % (args.subunit.lower(), args.version)

    tax_gz = prefix + ".txt.gz"
    fetch("%s/taxonomy/%s" % (web, tax_gz), tax_gz)
    with gzip.open(tax_gz, "rt") as f, \
            open(os.path.join(args.outdir, "nodes.dmp"), "w") as nodes, \
            open(os.path.join(args.outdir, "names.dmp"), "w") as names:
        prepare_dmps(f, nodes, names)
    os.remove(tax_gz)

    acc_gz = prefix + ".acc_taxid.gz"
    fetch("%s/taxonomy/%s" % (web, acc_gz), acc_gz)
    with gzip.open(acc_gz, "rt") as f, \
            open(os.path.join(args.outdir, "silva_seqid_to_taxid.map"), "w") as out:
        out.write(f.read())
    os.remove(acc_gz)

    fa_prefix = "SILVA_%s_%sRef_%s" % (args.version, args.subunit,
                                       "NR99_" if args.NR99 else "")
    fa_gz = fa_prefix + "tax_silva.fasta.gz"
    fetch("%s/%s" % (web, fa_gz), fa_gz)
    with gzip.open(fa_gz, "rt") as f, \
            gzip.open(os.path.join(args.outdir, "silva_seq.fa.gz"), "wt") as out:
        convert_fasta(f, out)
    os.remove(fa_gz)


if __name__ == "__main__":
    main()

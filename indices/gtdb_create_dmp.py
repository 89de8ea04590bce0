#!/usr/bin/env python3
"""Create nodes/names dmp files + file/taxid maps from GTDB metadata.

Python port of indices/gtdb-create-dmp.pl: walks each representative genome's
gtdb_taxonomy lineage, assigning NCBI taxids by scientific name when a
names.dmp is given and fresh ids (>= --taxIDStart) otherwise; emits
<prefix>_nodes.dmp, <prefix>_names.dmp, <prefix>_fname_to_taxid.map and
<prefix>_file.list (and optionally the per-sequence map)."""

import argparse
import gzip
import os
import sys

RANK_FULL = {"d": "domain", "p": "phylum", "c": "class", "o": "order",
             "f": "family", "g": "genus", "s": "species", "x": "no rank"}


def accession_subdir(acc):
    return "%s/%s/%s/%s" % (acc[0:3], acc[4:7], acc[7:10], acc[10:13])


def genome_file_path(gdir, acc):
    return "%s/database/%s/%s_genomic.fna.gz" % (gdir, accession_subdir(acc), acc)


def create_dmps(meta_lines, genome_dir, out_prefix, ncbi_names=None,
                tax_id_start=10000000):
    """meta_lines: iterable over the GTDB metadata TSV (header first).
    Returns fname->taxid dict; writes the four output files."""
    ncbi = ncbi_names or {}
    it = iter(meta_lines)
    header = next(it).rstrip("\n").split("\t")
    col = {c: i for i, c in enumerate(header)}

    novel = tax_id_start
    new_names = {}
    nodes = {}
    ranks = {}
    names = {}
    fname_to_taxid = {}

    f_nodes = open(out_prefix + "_nodes.dmp", "w")
    f_names = open(out_prefix + "_names.dmp", "w")
    f_map = open(out_prefix + "_fname_to_taxid.map", "w")
    f_list = open(out_prefix + "_file.list", "w")
    f_nodes.write("1\t|\t1\t|\tno rank\t|\n")
    f_names.write("1\t|\troot\t|\tscientific name\t|\n")

    for line in it:
        cols = line.rstrip("\n").split("\t")
        if cols[col["gtdb_representative"]] != "t":
            continue
        accession = cols[col["accession"]][3:]
        lineage = cols[col["gtdb_taxonomy"]]
        taxid = 1
        parent = 1
        fields = lineage.split(";")
        for j, fld in enumerate(fields):
            code, _, name = fld.partition("__")
            if name in ncbi:
                ltid = int(ncbi[name])
            elif fld in new_names:
                ltid = new_names[fld]
            else:
                ltid = novel
                new_names[fld] = ltid
                novel += 1
            if j == len(fields) - 1:
                taxid = ltid
            if ltid in nodes and nodes[ltid] != parent:
                raise RuntimeError(
                    "A conflict of lineage information is found when "
                    "processing %s" % lineage)
            nodes[ltid] = parent
            ranks[ltid] = code
            names[ltid] = name
            parent = ltid
        path = genome_file_path(genome_dir, accession)
        fname_to_taxid[path] = taxid
        f_map.write("%s\t%d\n" % (path, taxid))
        f_list.write(path + "\n")

    for tid in nodes:
        f_nodes.write("%d\t|\t%d\t|\t%s\t|\n" % (
            tid, nodes[tid], RANK_FULL.get(ranks[tid], "no rank")))
        f_names.write("%d\t|\t%s\t|\tscientific name\t|\n" % (tid, names[tid]))
    for f in (f_nodes, f_names, f_map, f_list):
        f.close()
    return fname_to_taxid


def read_ncbi_names(path):
    out = {}
    with open(path) as f:
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) > 6 and cols[6] == "scientific name":
                out[cols[2]] = cols[0]
    return out


def generate_seqid_map(out_prefix, fname_to_taxid):
    with open(out_prefix + "_seqid_to_taxid.map", "w") as out:
        for path, taxid in fname_to_taxid.items():
            op = gzip.open if path.endswith(".gz") else open
            try:
                with op(path, "rt") as f:
                    for line in f:
                        if line.startswith(">"):
                            out.write("%s\t%d\n" % (line[1:].split()[0], taxid))
            except OSError:
                sys.stderr.write("Warning: cannot read %s\n" % path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", dest="genome_dir", required=True)
    ap.add_argument("-m", dest="meta", required=True)
    ap.add_argument("-o", dest="out_prefix", default="gtdb")
    ap.add_argument("--names", default=None)
    ap.add_argument("--taxIDStart", type=int, default=10000000)
    ap.add_argument("--generateSeqId2TaxId", action="store_true")
    args = ap.parse_args()

    ncbi = read_ncbi_names(args.names) if args.names else None
    with open(args.meta) as f:
        fmap = create_dmps(f, os.path.abspath(args.genome_dir),
                           args.out_prefix, ncbi, args.taxIDStart)
    if args.generateSeqId2TaxId:
        generate_seqid_map(args.out_prefix, fmap)


if __name__ == "__main__":
    main()

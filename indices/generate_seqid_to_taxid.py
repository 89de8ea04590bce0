#!/usr/bin/env python3
"""seqid->taxid map from a genome fasta + NCBI accession2taxid
(port of indices/GenerateSeqIdToTaxId.pl)."""

import gzip
import sys


def main():
    if len(sys.argv) < 3:
        sys.exit("usage: generate_seqid_to_taxid.py genomes.fa.gz "
                 "accession2taxid.gz > seqid_to_taxid.map")
    seqids = set()
    op = gzip.open if sys.argv[1].endswith(".gz") else open
    with op(sys.argv[1], "rt") as f:
        for line in f:
            if line.startswith(">"):
                seqids.add(line[1:].split()[0])
    op = gzip.open if sys.argv[2].endswith(".gz") else open
    with op(sys.argv[2], "rt") as f:
        next(f)  # header
        for line in f:
            cols = line.split()
            if len(cols) > 2 and cols[1] in seqids:
                sys.stdout.write("%s\t%s\n" % (cols[1], cols[2]))


if __name__ == "__main__":
    main()

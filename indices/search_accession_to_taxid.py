#!/usr/bin/env python3
"""seqid->taxid for a list of seqids against an accession_taxid map; unknown
accessions map to taxid 1 (port of indices/SearchAccessionIdToTaxId.pl)."""

import sys


def main():
    if len(sys.argv) < 3:
        sys.exit("usage: search_accession_to_taxid.py seqid.list "
                 "accession_taxid.map > seqid_to_taxid.map")
    amap = {}
    with open(sys.argv[2]) as f:
        for line in f:
            cols = line.split()
            if len(cols) > 2:
                amap[cols[0]] = cols[2]
    with open(sys.argv[1]) as f:
        for line in f:
            line = line.rstrip("\n")
            acc = line.split(".")[0]
            sys.stdout.write("%s\t%s\n" % (line, amap.get(acc, "1")))


if __name__ == "__main__":
    main()

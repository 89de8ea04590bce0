#!/usr/bin/env python3
"""Download NCBI core_nt via BLAST db dumps and produce build inputs
(port of indices/core_nt-download.pl): fetches the core_nt tarballs from the
metadata json, extracts fasta with blastdbcmd, collects seqids and maps them
to taxids via accession2taxid."""

import argparse
import json
import os
import subprocess
import sys
import urllib.request

META_URL = "https://ftp.ncbi.nih.gov/blast/db/core_nt-nucl-metadata.json"


def log(msg):
    sys.stderr.write(msg + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", dest="prefix", default="core_nt")
    ap.add_argument("--blast", default="", help="path to blast bin with blastdbcmd")
    ap.add_argument("--accession2taxid", required=True)
    ap.add_argument("--noclean", action="store_true")
    args = ap.parse_args()

    urllib.request.urlretrieve(META_URL, "core_nt-nucl-metadata.json")
    with open("core_nt-nucl-metadata.json") as f:
        meta = json.load(f)
    tars = meta.get("files", [])

    blastdbcmd = os.path.join(args.blast, "blastdbcmd") if args.blast else "blastdbcmd"
    fa_out = args.prefix + "_seq.fa.gz"
    seqid_list = args.prefix + "_seqid.list"
    with open(seqid_list, "w") as sl:
        for url in tars:
            name = url.rsplit("/", 1)[-1]
            log("fetching %s" % url)
            urllib.request.urlretrieve(url, name)
            subprocess.run(["tar", "-xzf", name], check=True)
            if not args.noclean:
                os.remove(name)
        db = args.prefix
        log("extracting fasta with %s" % blastdbcmd)
        with open(args.prefix + "_seq.fa", "w") as fa:
            subprocess.run([blastdbcmd, "-db", db, "-entry", "all"],
                           stdout=fa, check=True)
        with open(args.prefix + "_seq.fa") as fa:
            for line in fa:
                if line.startswith(">"):
                    sl.write(line[1:].split()[0] + "\n")
        subprocess.run(["gzip", "-f", args.prefix + "_seq.fa"], check=True)

    # map seqids to taxids
    here = os.path.dirname(os.path.abspath(__file__))
    with open(args.prefix + "_seqid_to_taxid.map", "w") as out:
        subprocess.run([sys.executable,
                        os.path.join(here, "search_accession_to_taxid.py"),
                        seqid_list, args.accession2taxid],
                       stdout=out, check=True)
    log("Done.")


if __name__ == "__main__":
    main()

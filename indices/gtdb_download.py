#!/usr/bin/env python3
"""Download GTDB representative genomes + metadata and create dmp files
(port of indices/gtdb-download.pl; delegates to gtdb_create_dmp.py)."""

import argparse
import gzip
import os
import subprocess
import sys
import tarfile
import urllib.request

FTP = "https://data.ace.uq.edu.au/public/gtdb/data/releases/latest/"


def fetch(url, dest):
    sys.stderr.write("downloading %s\n" % url)
    urllib.request.urlretrieve(url, dest)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", dest="prefix", default="gtdb")
    ap.add_argument("--names", default=None)
    ap.add_argument("--generateSeqId2TaxId", action="store_true")
    args = ap.parse_args()

    tar_file = "%s_genomes_reps.tar.gz" % args.prefix
    fetch(FTP + "genomic_files_reps/" + tar_file, tar_file)
    with tarfile.open(tar_file) as t:
        t.extractall(".")

    fetch(FTP + "VERSION.txt", "%s_version.txt" % args.prefix)
    with open("%s_version.txt" % args.prefix) as f:
        version = f.readline().strip().lstrip("v")

    meta = "%s_meta.tsv" % args.prefix
    with open(meta, "w") as out:
        for name, skip_header in (("bac120_metadata.tsv.gz", False),
                                  ("ar53_metadata.tsv.gz", True)):
            fetch(FTP + name, name)
            with gzip.open(name, "rt") as f:
                for line in f:
                    if skip_header and line.startswith("accession"):
                        continue
                    out.write(line)
            os.remove(name)

    cmd = [sys.executable, os.path.join(os.path.dirname(__file__),
                                        "gtdb_create_dmp.py"),
           "-d", "gtdb_genomes_reps_r%s" % version, "-m", meta,
           "-o", args.prefix]
    if args.names:
        cmd += ["--names", args.names]
    if args.generateSeqId2TaxId:
        cmd += ["--generateSeqId2TaxId"]
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()

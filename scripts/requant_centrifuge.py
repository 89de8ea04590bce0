#!/usr/bin/env python3
"""Recompute abundance from a Centrifuge classification using cfr-quant
(port of the reference's scripts/requant-centrifuge.pl): dumps the taxonomy
tables from a Centrifuge index via centrifuge-inspect, then runs our
quantifier on them."""

import os
import subprocess
import sys


def main():
    if len(sys.argv) < 4:
        sys.exit("usage: requant_centrifuge.py centrifuge_path "
                 "centrifuge_index_prefix centrifuge_class_out > report.tsv")
    cf_path, cf_index, classification = sys.argv[1:4]
    inspect = os.path.join(cf_path, "centrifuge-inspect")
    nodes, names, sizes = "tmp_nodes.out", "tmp_names.out", "tmp_sizes.out"
    with open(nodes, "w") as f:
        subprocess.run([inspect, "--taxonomy-tree", cf_index], stdout=f, check=True)
    with open(names, "w") as f:
        p = subprocess.run([inspect, "--name-table", cf_index],
                           capture_output=True, check=True)
        for line in p.stdout.decode().splitlines():
            cols = line.split()
            if len(cols) >= 2:
                f.write("%s\t|\t%s\t|\tscientific name\n" % (cols[0], cols[1]))
    with open(sizes, "w") as f:
        subprocess.run([inspect, "--size-table", cf_index], stdout=f, check=True)
    from centrifuger_tpu.cli.quant_cli import main as quant_main
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    quant_main(["--taxonomy-tree", nodes, "--name-table", names,
                "--size-table", sizes, "-c", classification])
    for p in (nodes, names, sizes):
        os.unlink(p)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Extract information from NCBI-style nodes.dmp taxonomy structures
(port of the reference's scripts/taxonomy.py; same CLI and output).

Operations: subtree (all ids under given roots), ancestors (root paths),
promote (climb to a given rank)."""

import argparse
import sys


def read_taxonomy_tree(path):
    tree = {}
    with open(path) as f:
        for line in f:
            fields = line.strip().split("\t")
            tid, parent, rank = fields[0], fields[2], fields[4]
            tree[tid] = [parent, rank]
    return tree


def get_subtree(tree, taxid):
    in_sub = {taxid: True}
    ret = {taxid}
    for tid in tree:
        if tid in in_sub:
            continue
        flag = False
        path = []
        t = tid
        while True:
            path.append(t)
            parent = tree[t][0]
            if parent in in_sub:
                flag = in_sub[parent]
                break
            if t == parent:
                break
            t = parent
        for p in path:
            in_sub[p] = flag
            if flag:
                ret.add(p)
    return ret


def get_ancestors(tree, taxid):
    path = []
    t = taxid
    while True:
        path.append(t)
        if t == tree[t][0]:
            break
        t = tree[t][0]
    path.reverse()
    return path


def promote_tax_level(tree, taxid, rank):
    t = taxid
    if t not in tree:
        return -1
    while True:
        if tree[t][1] == rank:
            return t
        parent = tree[t][0]
        if parent == t:
            break
        t = parent
    return -1


def print_tax(tree, taxid):
    if taxid in tree:
        print("\t".join([taxid, "|", tree[taxid][0], "|", tree[taxid][1], "|"]))
    else:
        print("\t".join([str(taxid), "|", "", "|", "", "|"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True, help="subtree, ancestors, promote")
    ap.add_argument("--tree", required=True, help="nodes.dmp")
    ap.add_argument("--taxid")
    ap.add_argument("--taxid-list", dest="taxid_list")
    ap.add_argument("--rank", dest="rank")
    args = ap.parse_args()

    tree = read_taxonomy_tree(args.tree)
    taxid_list = []
    if args.taxid:
        taxid_list = args.taxid.split(",")
    if args.taxid_list:
        with open(args.taxid_list) as f:
            taxid_list += [line.rstrip() for line in f]

    if args.op == "subtree":
        out = set()
        for t in taxid_list:
            out.update(get_subtree(tree, t))
        for t in sorted(out, key=int):
            print_tax(tree, t)
    elif args.op == "ancestors":
        out = set()
        for t in taxid_list:
            out.update(get_ancestors(tree, t))
        for t in sorted(out, key=int):
            print_tax(tree, t)
    elif args.op == "promote":
        for t in taxid_list:
            print_tax(tree, promote_tax_level(tree, t, args.rank))


if __name__ == "__main__":
    main()

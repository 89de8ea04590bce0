"""Succinct tree family vs brute-force plain trees.

Mirrors the reference's randomized self-checking cases `rmmtree`, `tree`,
`cardtree`, `patternrs` (compactds/test.cpp:1385-1793): every succinct
representation is checked op-by-op against the PlainTree/CardinalPlainTree
oracle on random trees.
"""

import numpy as np
import pytest

from centrifuger_tpu.succinct.trees import (
    BalancedParens, PatternRankSelect, PlainTree, CardinalPlainTree,
    TreeLOUDS, TreeBP, TreeDFUDS, TreeLabeled,
    TreeCardinalLOUDS, TreeCardinalOrdinal)


def random_tree(n, seed, max_label=5):
    rng = np.random.default_rng(seed)
    t = PlainTree()
    for _ in range(n - 1):
        p = int(rng.integers(0, t.n))
        v = t.add_node(p)
        t.set_label(v, int(rng.integers(0, max_label)))
    return t


def random_cardinal(n, c, seed):
    rng = np.random.default_rng(seed)
    t = CardinalPlainTree(c)
    while t.n < n:
        v = int(rng.integers(0, t.n))
        l = int(rng.integers(0, c))
        if t.slots[v][l] == -1:
            t.add_node(v, l)
    return t


def random_balanced_parens(n_pairs, seed):
    """Random balanced sequence via a random tree's BP encoding."""
    t = random_tree(n_pairs, seed)
    return TreeBP.from_plain(t).bp.bits[:2 * n_pairs].copy()


# ---------------------------------------------------------------- excess ops

class BruteParens:
    def __init__(self, bits):
        self.bits = np.asarray(bits).astype(np.int64)
        self.n = len(bits)
        self.E = np.cumsum(2 * self.bits - 1)

    def fwd_search(self, i, d):
        base = self.E[i - 1] if i > 0 else 0
        hits = np.flatnonzero(self.E[i:] - base == d)
        return i + int(hits[0]) if len(hits) else self.n

    def bwd_search(self, i, d):
        target = self.E[i] + d
        prefix = np.concatenate([[0], self.E[:i]])  # E(-1..i-1)
        hits = np.flatnonzero(prefix == target)
        return int(hits[-1]) if len(hits) else self.n

    def min_excess(self, i, j):
        return int(self.E[i:j + 1].min())

    def max_excess(self, i, j):
        return int(self.E[i:j + 1].max())

    def rmq(self, i, j):
        return i + int(np.argmin(self.E[i:j + 1]))

    def rMq(self, i, j):
        return i + int(np.argmax(self.E[i:j + 1]))

    def min_count(self, i, j):
        seg = self.E[i:j + 1]
        return int((seg == seg.min()).sum())

    def min_select(self, i, j, t):
        seg = self.E[i:j + 1]
        return i + int(np.flatnonzero(seg == seg.min())[t - 1])


def test_balanced_parens_excess_ops():
    bits = random_balanced_parens(600, seed=7)
    bp = BalancedParens(bits)
    br = BruteParens(bits)
    n = len(bits)
    rng = np.random.default_rng(1)
    for _ in range(300):
        i = int(rng.integers(0, n))
        d = int(rng.integers(-8, 9))
        assert bp.fwd_search(i, d) == br.fwd_search(i, d), (i, d)
        assert bp.bwd_search(i, d) == br.bwd_search(i, d), (i, d)
    for _ in range(300):
        i = int(rng.integers(0, n - 1))
        j = int(rng.integers(i, n))
        assert bp.min_excess(i, j) == br.min_excess(i, j)
        assert bp.max_excess(i, j) == br.max_excess(i, j)
        assert bp.rmq(i, j) == br.rmq(i, j)
        assert bp.rMq(i, j) == br.rMq(i, j)
        mc = br.min_count(i, j)
        assert bp.min_count(i, j) == mc
        t = int(rng.integers(1, mc + 1))
        assert bp.min_select(i, j, t) == br.min_select(i, j, t)


def test_balanced_parens_matching():
    bits = random_balanced_parens(400, seed=11)
    bp = BalancedParens(bits)
    # brute-force matching with a stack
    stack, match = [], {}
    for i, b in enumerate(bits):
        if b:
            stack.append(i)
        else:
            match[stack.pop()] = i
    for o, c in match.items():
        assert bp.find_close(o) == c
        assert bp.find_open(c) == o
    # enclose: nearest enclosing open paren
    for o in list(match)[:200]:
        if o == 0:
            continue
        depth = 0
        for j in range(o - 1, -1, -1):
            depth += 1 if bits[j] else -1
            if depth == 1:
                assert bp.enclose(o) == j
                break


def test_pattern_rank_select():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 5000).astype(np.uint8)
    for pat in [(1, 0), (0, 0), (1, 1, 0)]:
        prs = PatternRankSelect(bits, pat)
        p = len(pat)
        occ = [i for i in range(len(bits) - p + 1)
               if tuple(bits[i:i + p]) == pat]
        assert prs.total == len(occ)
        for i in range(0, len(bits), 37):
            truth = sum(1 for o in occ if o <= i)
            assert prs.rank(i) == truth
            assert prs.rank(i, inclusive=False) == sum(1 for o in occ if o < i)
        for k in range(1, len(occ) + 1, 53):
            assert prs.select(k) == occ[k - 1]


# ---------------------------------------------------------------- tree reps

def _check_ordinal(succ, plain, id_map, order_of):
    """Op-by-op equality of a succinct ordinal tree against PlainTree,
    the same matrix as reference test.cpp:1571-1607."""
    inv = {}
    for v in range(plain.n):
        inv[id_map[v]] = v
    for v in range(plain.n):
        h = succ.node_select(id_map[v])
        assert succ.node_map(h) == id_map[v]
        assert succ.is_leaf(h) == plain.is_leaf(v)
        assert succ.children_count(h) == plain.children_count(v)
        assert succ.child_rank(h) == plain.child_rank(v)
        if not plain.is_leaf(v):
            assert succ.node_map(succ.first_child(h)) == id_map[plain.first_child(v)]
            assert succ.node_map(succ.last_child(h)) == id_map[plain.last_child(v)]
            for t in range(1, plain.children_count(v) + 1):
                assert succ.node_map(succ.child_select(h, t)) == \
                    id_map[plain.child_select(v, t)]
        if v != 0:
            assert succ.node_map(succ.parent(h)) == id_map[plain.parent[v]]
            if not plain.is_last_child(v):
                assert succ.node_map(succ.next_sibling(h)) == \
                    id_map[plain.next_sibling(v)]
            if not plain.is_first_child(v):
                assert succ.node_map(succ.prev_sibling(h)) == \
                    id_map[plain.prev_sibling(v)]
    rng = np.random.default_rng(5)
    for _ in range(150):
        u, v = int(rng.integers(0, plain.n)), int(rng.integers(0, plain.n))
        hu, hv = succ.node_select(id_map[u]), succ.node_select(id_map[v])
        assert succ.node_map(succ.lca(hu, hv)) == id_map[plain.lca(u, v)]
        assert succ.is_ancestor(hu, hv) == plain.is_ancestor(u, v)


@pytest.mark.parametrize("cls", [TreeLOUDS, TreeBP, TreeDFUDS])
@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (300, 2), (500, 3)])
def test_ordinal_trees(cls, n, seed):
    plain = random_tree(n, seed)
    t = cls.from_plain(plain)
    _check_ordinal(t, plain, t.id_map, None)


def test_bp_extras():
    plain = random_tree(400, seed=9)
    t = TreeBP.from_plain(plain)
    pre = plain.preorder()
    # depth / subtree size / leaf counts / postorder round-trip
    for v in range(plain.n):
        h = t.node_select(t.id_map[v])
        assert t.depth(h) == plain.depth(v)
        assert t.subtree_size(h) == plain.subtree_size(v)
        assert t.leaf_count_in_subtree(h) == plain.leaf_count_in_subtree(v)
        po = t.post_order(h)
        assert t.post_order_select(po) == h
    # preorder ids are the node_map order
    for i, v in enumerate(pre):
        assert t.id_map[v] == i


def test_dfuds_extras():
    plain = random_tree(400, seed=13)
    t = TreeDFUDS.from_plain(plain)
    for v in range(plain.n):
        h = t.node_select(t.id_map[v])
        assert t.subtree_size(h) == plain.subtree_size(v)
        assert t.leaf_count_in_subtree(h) == plain.leaf_count_in_subtree(v)
    # leaf rank/select round trip over all leaves in B order
    leaves = [t.node_select(t.id_map[v]) for v in range(plain.n)
              if plain.is_leaf(v)]
    leaves.sort()
    for k, h in enumerate(leaves, 1):
        assert t.leaf_select(k) == h


def test_labeled_tree():
    plain = random_tree(300, seed=17, max_label=4)
    t = TreeLabeled.from_plain(plain)
    for v in range(plain.n):
        h = t.node_select(t.id_map[v])
        if v != 0:
            assert t.child_label(h) == plain.get_label(v)
        for l in range(4):
            kids = [c for c in plain.children[v] if plain.get_label(c) == l]
            assert t.children_labeled(h, l) == len(kids)
            for k, c in enumerate(kids, 1):
                assert t.node_map(t.labeled_child_select(h, l, k)) == t.id_map[c]


@pytest.mark.parametrize("n,c,seed", [(1, 3, 0), (200, 4, 1), (350, 2, 2)])
def test_cardinal_louds(n, c, seed):
    plain = random_cardinal(n, c, seed)
    t = TreeCardinalLOUDS.from_plain(plain)
    m = t.id_map
    for v in range(plain.n):
        assert t.children_count(m[v]) == plain.children_count(v)
        assert t.is_leaf(m[v]) == plain.is_leaf(v)
        assert t.child_rank(m[v]) == plain.child_rank(v)
        for l in range(c):
            ch = plain.labeled_child(v, l)
            assert t.has_labeled_child(m[v], l) == (ch != -1)
            if ch != -1:
                assert t.labeled_child(m[v], l) == m[ch]
        for tt in range(1, plain.children_count(v) + 1):
            assert t.child_select(m[v], tt) == m[plain.child_select(v, tt)]
        if v != 0:
            assert t.parent(m[v]) == m[plain.parent[v]]
            assert t.child_label(m[v]) == plain.child_label(v)
    rng = np.random.default_rng(7)
    for _ in range(100):
        u, v = int(rng.integers(0, plain.n)), int(rng.integers(0, plain.n))
        assert t.lca(m[u], m[v]) == m[plain.lca(u, v)]


@pytest.mark.parametrize("n,c,seed", [(1, 3, 0), (200, 4, 3), (350, 2, 4)])
def test_cardinal_ordinal(n, c, seed):
    plain = random_cardinal(n, c, seed)
    t = TreeCardinalOrdinal.from_plain(plain)
    m = t.id_map
    for v in range(plain.n):
        h = t.node_select(m[v])
        assert t.children_count(h) == plain.children_count(v)
        assert t.is_leaf(h) == plain.is_leaf(v)
        if v != 0:
            assert t.child_label(h) == plain.child_label(v)
            assert t.node_map(t.parent(h)) == m[plain.parent[v]]
        for l in range(c):
            ch = plain.labeled_child(v, l)
            got = t.labeled_child(h, l)
            if ch == -1:
                assert got == -1
            else:
                assert t.node_map(got) == m[ch]


def test_space_is_succinct():
    plain = random_tree(4000, seed=23)
    louds = TreeLOUDS.from_plain(plain)
    bp = TreeBP.from_plain(plain)
    # pointer rep would be >= 8 bytes/node; succinct core should be well under
    # (directories included, small-n constants forgiven)
    assert louds.B.nbytes() < 4000
    assert bp.B.nbytes() < 4000

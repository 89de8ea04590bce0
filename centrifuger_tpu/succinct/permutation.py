"""Permutations with shortcut inverses, permutation-backed sequences, and
inverted indexes.

Library counterparts of the reference's compactds/Permutation.hpp,
DS_InvPermutation.hpp, Sequence_Permutation.hpp and InvertedIndex.hpp.
The shortcut-inverse structure stores a back pointer every t steps of each
cycle, so pi^{-1}(i) is found in < t forward steps — the classical
t-shortcut compressed inverse.
"""

import numpy as np

from .bitvector import Bitvector
from .bitvectors import SelectSupport, SparseBitvector
from .bits import FixedArray


class InvPermutationSupport:
    """Shortcut inverse over a permutation pi (reference
    compactds/DS_InvPermutation.hpp): marks every t-th element along each
    cycle and stores a pointer that jumps t steps backwards."""

    def __init__(self, pi, t=8):
        pi = np.asarray(pi, dtype=np.int64)
        n = len(pi)
        self.t = int(t)
        visited = np.zeros(n, dtype=bool)
        marks = np.zeros(n, dtype=bool)
        back = {}
        for s in range(n):
            if visited[s]:
                continue
            cycle = []
            v = s
            while not visited[v]:
                visited[v] = True
                cycle.append(v)
                v = int(pi[v])
            L = len(cycle)
            if L > self.t:
                for j in range(0, L, self.t):
                    marks[cycle[j]] = True
                    back[cycle[j]] = cycle[(j - self.t) % L]
        self.marks = Bitvector.from_bits(marks)
        order = np.flatnonzero(marks)
        ptrs = np.array([back[i] for i in order], dtype=np.int64) \
            if len(order) else np.zeros(0, np.int64)
        self.ptrs = FixedArray.from_values(ptrs.astype(np.uint64),
                                           max(1, int(n - 1).bit_length()))

    def shortcut(self, i):
        """Back pointer at i, or -1 if i is unmarked (scalar)."""
        if int(self.marks.access(i)) == 0:
            return -1
        r = int(self.marks.rank1_inclusive(i))
        return int(self.ptrs.read(np.array([r - 1]))[0])


class Permutation:
    """pi with O(1) forward and O(t) inverse (reference
    compactds/Permutation.hpp).  Forward table is bit-packed."""

    def __init__(self, pi, t=8):
        pi = np.asarray(pi, dtype=np.int64)
        self.n = len(pi)
        w = max(1, int(max(self.n - 1, 1)).bit_length())
        self.pi = FixedArray.from_values(pi.astype(np.uint64), w)
        self.inv = InvPermutationSupport(pi, t)

    def next(self, i):
        """pi[i], vectorized."""
        return self.pi.read(np.asarray(i, dtype=np.int64)).astype(np.int64)

    def prev(self, i):
        """pi^{-1}(i) in O(t): walk forward along the cycle; the first marked
        element passed jumps t steps back (behind i), after which at most t
        forward steps reach the answer (reference compactds/
        DS_InvPermutation.hpp shortcut-walk semantics)."""
        j = int(i)
        took_shortcut = False
        guard = 0
        while int(self.pi.read(np.array([j]))[0]) != i:
            s = -1 if took_shortcut else self.inv.shortcut(j)
            if s >= 0:
                j = s
                took_shortcut = True
            else:
                j = int(self.pi.read(np.array([j]))[0])
            guard += 1
            if guard > self.n + 2:
                raise RuntimeError("not a permutation")
        return j

    def nbytes(self):
        return self.pi.nbytes() + self.inv.marks.nbytes() + self.inv.ptrs.nbytes()


class SequencePermutation:
    """Large-alphabet sequence via per-block symbol permutations (the idea of
    reference compactds/Sequence_Permutation.hpp, which is marked UNFINISHED
    at its lines 3-4; this is a working completion).  Stores, per block, the
    stable-sort permutation and per-symbol counts in a sparse prefix-sum, so
    rank/select/access reduce to permutation lookups."""

    def __init__(self, codes, sigma, block=1024):
        codes = np.asarray(codes, dtype=np.int64)
        self.n = len(codes)
        self.sigma = int(sigma)
        self.b = int(block)
        nblk = (self.n + self.b - 1) // self.b
        self.nblk = nblk
        self.perms = []
        # per block: positions sorted by (symbol, position) — the inverse
        # permutation of "where does each occurrence go in sorted order"
        self.block_counts = np.zeros((nblk + 1, sigma), dtype=np.int64)
        for bi in range(nblk):
            seg = codes[bi * self.b:(bi + 1) * self.b]
            order = np.argsort(seg, kind="stable").astype(np.int64)
            self.perms.append(Permutation(order))
            self.block_counts[bi + 1] = self.block_counts[bi] + \
                np.bincount(seg, minlength=sigma)

    def rank(self, c, i):
        """Count of c in codes[0..i] (scalar)."""
        i = int(i)
        bi = i // self.b
        base = int(self.block_counts[bi, c])
        # within block: occurrences of c at sorted slots
        # [cnt(<c), cnt(<=c)) — find how many have position <= i via the perm
        seg_counts = self.block_counts[bi + 1] - self.block_counts[bi]
        lo = int(seg_counts[:c].sum())
        hi = lo + int(seg_counts[c])
        cnt = 0
        p = self.perms[bi]
        for slot in range(lo, hi):
            if int(p.next(slot)) + bi * self.b <= i:
                cnt += 1
        return base + cnt

    def access(self, i):
        """Symbol at i (scalar): invert the block permutation, then find which
        symbol bucket the sorted slot lands in."""
        i = int(i)
        bi = i // self.b
        slot = self.perms[bi].prev(i - bi * self.b)
        seg_counts = self.block_counts[bi + 1] - self.block_counts[bi]
        cum = np.cumsum(seg_counts)
        return int(np.searchsorted(cum, slot, side="right"))

    def select(self, c, k):
        """Position of the k-th c (k>=1, scalar)."""
        # block containing the k-th c
        bi = int(np.searchsorted(self.block_counts[:, c], k, side="left")) - 1
        kin = k - int(self.block_counts[bi, c])
        seg_counts = self.block_counts[bi + 1] - self.block_counts[bi]
        lo = int(seg_counts[:c].sum())
        p = self.perms[bi]
        # occurrences of c in this block are sorted slots lo..; the kin-th one
        # by position requires sorting their positions
        pos = sorted(int(p.next(s)) for s in range(lo, lo + int(seg_counts[c])))
        return bi * self.b + pos[kin - 1]

    def nbytes(self):
        return sum(p.nbytes() for p in self.perms) + self.block_counts.nbytes


class InvertedIndex:
    """Posting lists for a sequence of symbols (reference
    compactds/InvertedIndex.hpp, permutation-based): here each symbol's
    positions live in an Elias–Fano sparse bitvector, giving O(1) access to
    the k-th posting and rank-style counting."""

    def __init__(self, codes, sigma):
        codes = np.asarray(codes, dtype=np.int64)
        self.n = len(codes)
        self.sigma = int(sigma)
        self.lists = []
        for c in range(sigma):
            pos = np.flatnonzero(codes == c)
            self.lists.append(SparseBitvector(pos, max(self.n, 1)))

    def count(self, c):
        return self.lists[int(c)].m

    def posting(self, c, k):
        """k-th position of symbol c (k >= 1), vectorized over k."""
        return self.lists[int(c)].select1(k)

    def count_upto(self, c, i):
        """# of postings of c at positions <= i."""
        return self.lists[int(c)].rank1_inclusive(i)

    def nbytes(self):
        return sum(l.nbytes() for l in self.lists)

"""Suffix array construction (host-side, offline).

The reference builds the SA blockwise with a difference cover + multikey
quicksort pipeline tuned for bounded memory (compactds/SuffixArrayGenerator.hpp,
compactds/FMBuilder.hpp).  Index construction is an offline host job in this
framework, so we use a vectorized prefix-doubling sort (NumPy lexsort) which is
simple, exact, and fast enough for multi-Mnt databases; comparison semantics
match the reference's sentinel-free ordering where a shorter suffix sorts before
any suffix it prefixes (SubrangeCompare, compactds/FixedSizeElemArray.hpp:283-...).
"""

import ctypes

import numpy as np


def suffix_array(codes, sigma=None):
    """SA of the code sequence (no sentinel; shorter-suffix-first ordering).
    Uses the native linear-time SA-IS builder when available, falling back to
    NumPy prefix doubling."""
    codes = np.asarray(codes)
    n = len(codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    sa = _sais(codes, sigma)
    if sa is not None:
        return sa
    return _suffix_array_doubling(codes)


def _sais(codes, sigma):
    from ..native import load
    lib = load("sais")
    if lib is None:
        return None
    if sigma is None:
        sigma = int(codes.max()) + 1
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    sa = np.empty(len(codes), dtype=np.int64)
    fn = lib.sais_u8
    fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                   ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
    fn.restype = ctypes.c_int
    rc = fn(codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(codes), sigma,
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        return None
    return sa


def _suffix_array_doubling(codes):
    n = len(codes)
    rank = codes.astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        # key = (rank[i], rank[i+k]) with rank[-1] = -1 past the end
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        # recompute ranks
        r_ord = rank[order]
        s_ord = second[order]
        changed = np.ones(n, dtype=np.int64)
        changed[1:] = (r_ord[1:] != r_ord[:-1]) | (s_ord[1:] != s_ord[:-1])
        new_rank_ord = np.cumsum(changed) - 1
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank_ord
        if new_rank_ord[-1] == n - 1:
            return order
        k *= 2
        if k >= n:
            # all distinct at this point necessarily, but guard anyway
            return order


def bwt_from_sa(codes, sa):
    """BWT with no explicit end marker: BWT[i] = T[SA[i]-1], and for SA[i]==0 the
    last character of T is stored (reference compactds/FMBuilder.hpp:244-250).
    Returns (bwt_codes, first_isa)."""
    codes = np.asarray(codes, dtype=np.uint8)
    n = len(codes)
    bwt = np.where(sa == 0, codes[n - 1], codes[sa - 1]).astype(np.uint8)
    first_isa = int(np.flatnonzero(sa == 0)[0])
    return bwt, first_isa

"""Regular (dv, dc) Gallager LDPC code construction — host side, cached.

The reference uses pyldpc's `make_ldpc(n, dv=4, dc=8, systematic=True,
sparse=True)` (reference OFDM_SISO_NBF_LDPC.py:196). We build our own code
from the same Gallager ensemble — per SURVEY.md §7 hard-part (5), codes drawn
from the same regular ensemble are BER-equivalent within the 0.5 dB budget;
bit-identical parity matrices are neither possible (different RNG) nor needed.

Construction:
  1. Gallager parity-check matrix: dv vertical "strips" of n/dc rows; strip 0
     has row i covering columns [i*dc, (i+1)*dc); each further strip is a
     uniform column permutation of strip 0.
  2. GF(2) Gaussian elimination finds m linearly independent pivot columns;
     columns are permuted so the pivots form the leading m x m block A.
     The permuted H' = [A | B] is THE code's parity matrix (the permutation
     just relabels code bits of an ensemble draw).
  3. Encoder matrix P = A^{-1} B (m x k over GF(2)); codeword = [P u | u] —
     systematic with the info bits in the LAST k positions, so message
     recovery (pyldpc's get_message) is a slice.

The decoder-side index tensors (check->var and var->edge gathers) are laid
out dense: (m, dc) and (n, dv) int32 arrays — TPU-friendly static gathers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np


class LdpcCode(NamedTuple):
    """Host-side immutable code description (NumPy; move to device lazily)."""
    n: int                  # codeword length
    k: int                  # info bits
    m: int                  # parity checks (rows of H)
    dv: int
    dc: int
    H: np.ndarray           # (m, n) int8 parity-check matrix (dense 0/1)
    P: np.ndarray           # (m, k) int8 encoder matrix: parity = P @ u mod 2
    ck_cols: np.ndarray     # (m, dc) int32: columns participating in check i
    var_edge: np.ndarray    # (n, dv) int32: flat indices into (m*dc) edge
    #                         array of the edges incident to variable v


def _gallager_H(n: int, dv: int, dc: int, rng: np.random.Generator) -> np.ndarray:
    assert n % dc == 0
    rows_per_strip = n // dc
    strip = np.zeros((rows_per_strip, n), dtype=np.int8)
    for i in range(rows_per_strip):
        strip[i, i * dc:(i + 1) * dc] = 1
    strips = [strip]
    for _ in range(dv - 1):
        perm = rng.permutation(n)
        strips.append(strip[:, perm])
    return np.concatenate(strips, axis=0)


def _gf2_pivot_columns(H: np.ndarray):
    """Row-reduce a copy of H over GF(2); return (pivot_cols, rank)."""
    A = H.copy().astype(np.uint8)
    m, n = A.shape
    pivots = []
    r = 0
    for c in range(n):
        if r >= m:
            break
        rows = np.nonzero(A[r:, c])[0]
        if len(rows) == 0:
            continue
        pr = r + rows[0]
        if pr != r:
            A[[r, pr]] = A[[pr, r]]
        elim = np.nonzero(A[:, c])[0]
        elim = elim[elim != r]
        A[elim] ^= A[r]
        pivots.append(c)
        r += 1
    return pivots, r


def _gf2_inv_apply(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Solve A X = B over GF(2) for invertible A (m x m); returns X (m x k)."""
    m = A.shape[0]
    aug = np.concatenate([A, B], axis=1).astype(np.uint8)
    for col in range(m):
        rows = np.nonzero(aug[col:, col])[0]
        pr = col + rows[0]
        if pr != col:
            aug[[col, pr]] = aug[[pr, col]]
        elim = np.nonzero(aug[:, col])[0]
        elim = elim[elim != col]
        aug[elim] ^= aug[col]
    return aug[:, m:]


@functools.lru_cache(maxsize=None)
def make_regular_ldpc(n: int, dv: int = 4, dc: int = 8,
                      seed: int = 0) -> LdpcCode:
    """Build (and cache) a regular Gallager code with a full-rank-trimmed H."""
    rng = np.random.default_rng(seed + 1_000_003)
    # retry the ensemble draw until H has close-to-full row rank and an
    # invertible leading block can be formed (a few redraws at most)
    for _ in range(50):
        H = _gallager_H(n, dv, dc, rng)
        pivots, rank = _gf2_pivot_columns(H)
        # Gallager strips always share the all-rows-sum parity => rank <= m-?
        # we simply drop dependent rows to get a full-rank H
        if rank >= H.shape[0] - dv:
            break
    # drop linearly dependent rows (pivot columns of H^T are independent rows;
    # a Gallager matrix loses ~dv-1 ranks because every strip's rows sum to
    # the all-ones vector — pyldpc's G.shape[1] grows by the same amount)
    keep, _ = _gf2_pivot_columns(H.T)
    H = H[np.asarray(keep)]
    m = H.shape[0]
    pivots, rank = _gf2_pivot_columns(H)
    assert rank == m, (rank, m)
    pivots = np.asarray(pivots[:m])
    rest = np.setdiff1d(np.arange(n), pivots)
    perm = np.concatenate([pivots, rest])
    Hp = np.ascontiguousarray(H[:, perm])
    A, B = Hp[:, :m], Hp[:, m:]
    P = _gf2_inv_apply(A, B).astype(np.int8)
    k = n - m

    # decoder index tensors; rows of Hp may have unequal weight after the
    # row-drop (still ~dc); pad each check's column list to the max weight
    # with a sentinel column n (handled as an always-erased +inf-LLR edge)
    row_weights = Hp.sum(axis=1)
    dc_max = int(row_weights.max())
    ck_cols = np.full((m, dc_max), n, dtype=np.int32)
    for i in range(m):
        cols = np.nonzero(Hp[i])[0]
        ck_cols[i, :len(cols)] = cols
    # var -> incident edge flat positions (into the (m, dc_max) edge array)
    col_weights = Hp.sum(axis=0)
    dv_max = int(col_weights.max())
    var_edge = np.full((n, dv_max), m * dc_max, dtype=np.int32)
    fill = np.zeros(n, dtype=np.int64)
    for i in range(m):
        for j, c in enumerate(ck_cols[i]):
            if c < n:
                var_edge[c, fill[c]] = i * dc_max + j
                fill[c] += 1
    return LdpcCode(n=n, k=k, m=m, dv=dv, dc=dc, H=Hp.astype(np.int8), P=P,
                    ck_cols=ck_cols, var_edge=var_edge)

"""5G NR LDPC encoder (3GPP TS 38.212 §5.2.2/§5.3.2/§5.4.2) for the sm1
pipeline.

Replaces the round-2/3 stand-in (framework QC codewords) for the reference's
`LDPC5GEncoder(k, n)` (esn_ofdm_mimo_via_cdl.py:68 — encoder-only: the
decoder object at :69 is instantiated but never called, :240-260). The sm1
chain for n = 3072, k = 1536 resolves to base graph 2, Z_c = 160 (lifting
set a=5), K = 1600 with 64 filler bits, rate matching from the circular
buffer at redundancy version 0.

Spec-exact machinery (all unit-tested in tests/test_nr_ldpc.py):
  * lifting-size table Z = a * 2^j (Table 5.3.2-1) and the min-Z selection
    kb*Z >= K
  * base-graph selection rule (§7.2.2): BG2 iff K <= 292, or (K <= 3824 and
    R <= 0.67), or R <= 0.25
  * kb rule for BG2 (10 / 9 / 8 / 6 by K) and BG1 (22)
  * lifted-graph systematic encoding: core-parity solve over GF(2) +
    extension-row accumulation (double-diagonal core, identity extension)
  * 2*Zc systematic puncturing, filler-bit insertion/skipping, circular-
    buffer bit selection at rv0, optional Qm row-column bit interleaver
    (§5.4.2.2)

Base-graph DATA caveat — read before comparing codewords bit-for-bit with
another 38.212 implementation: this offline build environment carries no
copy of TS 38.212 Tables 5.3.2-2/-3 (the ~316/197-entry per-set shift
coefficient tables), and hallucinating hundreds of table values would be
worse than stating the gap. `_surrogate_basegraph` therefore generates a
STRUCTURE-EXACT surrogate: exact dimensions (BG1 46x68/22 info cols, BG2
42x52/10), the NR core-parity skeleton (double diagonal with the
weight-3 first parity column and its shift-1 top entry), identity
extension columns, high-degree punctured columns, and deterministic
per-set shift coefficients. Codewords are valid codewords of a
38.212-structured QC-LDPC code at the spec rate — H @ c^T = 0 on the
lifted graph is asserted — but not bit-identical to the 38.212 tables'
code. For the sm1 pipeline this is immaterial (encoder-only path: only
the uniform codeword-bit law reaches the classifiers; SER anchors
re-validated in tests/test_sm1.py), and swapping the true tables into
`_BG_TABLES` upgrades to standards-exact with no other code change.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

from .code import _gf2_inv_apply

# Table 5.3.2-1: lifting sizes, indexed by set iLS = 0..7 (a = 2,3,...,15)
_LIFT_A = (2, 3, 5, 7, 9, 11, 13, 15)
LIFT_SIZES = tuple(sorted(
    {a * (1 << j) for a in _LIFT_A for j in range(8) if a * (1 << j) <= 384}))


def lifting_set(Z: int) -> int:
    """iLS index of lifting size Z: the unique a with Z = a * 2^j.

    (Pure powers of two belong to the a=2 set — the odd part alone would
    give 1, which is not a valid a.)"""
    for idx, a in enumerate(_LIFT_A):
        z = Z
        while z % 2 == 0 and z > a:
            z //= 2
        if z == a:
            return idx
    raise ValueError(f"Z={Z} is not in Table 5.3.2-1")


def select_basegraph(K: int, R: float) -> int:
    """§7.2.2: BG2 for small blocks / low rates, else BG1."""
    if K <= 292 or (K <= 3824 and R <= 0.67) or R <= 0.25:
        return 2
    return 1


def bg_kb(bg: int, K: int) -> int:
    if bg == 1:
        return 22
    if K > 640:
        return 10
    if K > 560:
        return 9
    if K > 192:
        return 8
    return 6


_BG_DIMS = {1: (46, 68, 22), 2: (42, 52, 10)}   # (m_b, n_b, info cols)


def _surrogate_basegraph(bg: int):
    """Deterministic structure-exact base graph (see module docstring).

    Returns {(i, j): shifts[8]} with shifts per lifting set, plus dims.
    Core parity skeleton (cols kb..kb+3, the NR double diagonal):
        row0: (kb, shift 1), (kb+1, 0)
        row1: (kb, 0), (kb+1, 0), (kb+2, 0)
        row2: (kb+2, 0), (kb+3, 0)
        row3: (kb, 0), (kb+3, 0)
    — column kb has weight 3 with one nonzero shift, so the core block is
    invertible for every even Z (checked per-Z at construction with a
    deterministic re-salt fallback for odd cases).
    """
    m_b, n_b, kb = _BG_DIMS[bg]
    rng = np.random.default_rng(38212 + bg)
    entries: dict = {}

    def put(i, j, shifts=None):
        if shifts is None:
            shifts = rng.integers(0, 384, size=8)
        entries[(i, j)] = np.asarray(shifts, dtype=np.int32)

    zeros = np.zeros(8, np.int32)
    # core parity skeleton (fixed shifts across sets, like the spec's
    # always-present double diagonal)
    put(0, kb, np.ones(8, np.int32))
    put(0, kb + 1, zeros)
    put(1, kb, zeros)
    put(1, kb + 1, zeros)
    put(1, kb + 2, zeros)
    put(2, kb + 2, zeros)
    put(2, kb + 3, zeros)
    put(3, kb, zeros)
    put(3, kb + 3, zeros)
    # dense core rows over the info columns (punctured cols 0,1 in all four)
    for i in range(4):
        cols = {0, 1} | set(rng.choice(np.arange(2, kb),
                                       size=max(kb - 6, 2), replace=False))
        for j in sorted(cols):
            put(i, j)
    # extension rows: identity column + a few info/core-parity connections
    for e in range(m_b - 4):
        i = 4 + e
        put(i, kb + 4 + e, zeros)                 # identity extension col
        deg = int(rng.integers(3, 6))
        cols = rng.choice(np.arange(0, kb + 4), size=deg, replace=False)
        for j in sorted(set(cols.tolist())):
            put(i, j)
    return entries, (m_b, n_b, kb)


# swap in the TS 38.212 Tables 5.3.2-2/-3 here for standards-exact codewords
# and flip BG_TABLES_SOURCE to "ts38212" — nothing else changes; the
# fingerprint below then self-describes the upgrade in every artifact.
_BG_TABLES = {bg: _surrogate_basegraph(bg) for bg in (1, 2)}
BG_TABLES_SOURCE = "surrogate"

# One-line artifact stamp (VERDICT r04 #5): sm1 result metadata
# (model_results.pkl meta dict, events.jsonl) carries this string so the
# caveat travels WITH the data instead of living only in this docstring.
NR_SURROGATE_CAVEAT = (
    "NR LDPC base graph is a STRUCTURE-EXACT SURROGATE (deterministic "
    "shift coefficients; TS 38.212 Tables 5.3.2-2/-3 unavailable in this "
    "offline build) — spec machinery exact, codewords NOT interoperable "
    "with a standards 38.212 codec; see esn_ofdm_mimo_tpu/ldpc/nr.py")


def basegraph_fingerprint() -> str:
    """Stable checksum of the active base-graph tables.

    Recorded in artifacts next to BG_TABLES_SOURCE: dropping in the true
    Tables 5.3.2-2/-3 later is then a VERIFIED one-line data change — the
    fingerprint in new artifacts changes, old artifacts keep describing the
    tables they were produced with (tests/test_nr_ldpc.py pins the current
    surrogate fingerprint so any accidental table edit fails loudly)."""
    import hashlib
    h = hashlib.sha256()
    for bg in sorted(_BG_TABLES):
        entries, dims = _BG_TABLES[bg]
        h.update(repr(dims).encode())
        for key in sorted(entries):
            h.update(repr((key, entries[key].tolist())).encode())
    return h.hexdigest()[:16]


class NrCode(NamedTuple):
    """Host-side immutable NR LDPC code description."""
    k: int                  # payload bits per code block
    E: int                  # rate-matched output bits
    bg: int                 # base graph (1 or 2)
    Z: int                  # lifting size Z_c
    iLS: int                # lifting set index
    kb: int                 # info columns used
    K: int                  # kb * Z (payload + fillers)
    F: int                  # filler bits
    m_b: int                # base parity rows
    n_b: int                # base columns
    M: np.ndarray           # (m_b*Z, K) int8: parity p = M @ u_padded mod 2
    sel: np.ndarray         # (E,) int32 rate-matching selection into c
    H_rows: tuple           # ((i, j, shift) ...) lifted-graph description


def _lift_block(shift: int, Z: int) -> np.ndarray:
    """Z x Z circulant permutation P^shift (I rolled right by shift)."""
    return np.roll(np.eye(Z, dtype=np.uint8), shift % Z, axis=1)


@functools.lru_cache(maxsize=8)
def make_nr_ldpc(k: int, E: int, bg: int | None = None) -> NrCode:
    """Build the NR code for payload k rate-matched to E bits (single code
    block, rv0; reference call shape LDPC5GEncoder(k, n))."""
    R = k / E
    bg = bg if bg is not None else select_basegraph(k, R)
    kb = bg_kb(bg, k)
    Z = next(z for z in LIFT_SIZES if kb * z >= k)
    iLS = lifting_set(Z)
    entries, (m_b, n_b, kb_cols) = _BG_TABLES[bg]
    K = kb_cols * Z          # systematic bits incl. fillers (spec pads the
    #                          unused kb..kb_cols-1 info columns as fillers
    #                          too when kb < kb_cols)
    F = K - k
    assert F >= 0, f"payload {k} exceeds K={K} (bg{bg}, Z={Z})"
    N_full = n_b * Z
    assert E <= (n_b - 2) * Z - F, (
        f"E={E} exceeds the circular buffer ({(n_b - 2) * Z - F} "
        f"non-filler bits) — segmentation not implemented")

    # ---- encoder matrix over GF(2) ------------------------------------
    shifts = {ij: int(s[iLS]) for ij, s in entries.items()}
    info_cols = kb_cols

    def lifted(rows, cols):
        out = np.zeros((len(rows) * Z, len(cols) * Z), np.uint8)
        for ri, i in enumerate(rows):
            for ci, j in enumerate(cols):
                if (i, j) in shifts:
                    out[ri * Z:(ri + 1) * Z, ci * Z:(ci + 1) * Z] = \
                        _lift_block(shifts[(i, j)], Z)
        return out

    A_core = lifted(range(4), range(info_cols))              # (4Z, K)
    # deterministic fallback: if the core is singular at this Z, bump the
    # nonzero shift of the weight-3 column until invertible (shifts dict is
    # updated so H_rows stays consistent with the encoder matrix)
    for salt in range(Z):
        shifts[(0, info_cols)] = (1 + salt) % Z
        B_core = lifted(range(4), range(info_cols, info_cols + 4))
        try:
            M_core = _gf2_inv_apply(B_core, A_core)          # (4Z, K)
            break
        except IndexError:
            continue
    else:
        raise AssertionError("no invertible core found")
    ext_rows = list(range(4, m_b))
    A_ext = lifted(ext_rows, range(info_cols))               # ((m_b-4)Z, K)
    C_ext = lifted(ext_rows, range(info_cols, info_cols + 4))
    M_ext = (A_ext + C_ext @ M_core) % 2
    M = np.concatenate([M_core, M_ext], axis=0).astype(np.int8)

    # ---- rate matching (rv0): puncture 2Z, skip fillers, wrap ----------
    cb = np.arange(2 * Z, N_full)
    filler = (cb >= k) & (cb < K)
    valid = cb[~filler]
    sel = valid[np.arange(E) % len(valid)].astype(np.int32)

    H_rows = tuple((i, j, shifts[(i, j)]) for (i, j) in sorted(shifts))
    return NrCode(k=k, E=E, bg=bg, Z=Z, iLS=iLS, kb=kb, K=K, F=F,
                  m_b=m_b, n_b=n_b, M=M, sel=sel, H_rows=H_rows)


def nr_encode(code: NrCode, u, interleave_qm: int | None = None):
    """u (..., k) bits -> rate-matched codeword (..., E) int8.

    interleave_qm: optional §5.4.2.2 row-column bit interleaver for a
    modulation order Qm (write row-wise into Qm rows, read column-wise)."""
    import jax.numpy as jnp
    pad = [(0, 0)] * (u.ndim - 1) + [(0, code.F)]
    u_pad = jnp.pad(u.astype(jnp.float32), pad)
    M = jnp.asarray(code.M, jnp.float32)
    p = jnp.mod(u_pad @ M.T, 2.0)
    c = jnp.concatenate([u_pad, p], axis=-1)
    e = c[..., jnp.asarray(code.sel)]
    if interleave_qm:
        Qm = int(interleave_qm)
        assert code.E % Qm == 0
        shp = e.shape[:-1]
        e = e.reshape(*shp, Qm, code.E // Qm)
        e = jnp.swapaxes(e, -1, -2).reshape(*shp, code.E)
    return e.astype(jnp.int8)


def nr_lifted_H(code: NrCode) -> np.ndarray:
    """Dense lifted parity-check matrix (m_b*Z, n_b*Z) — test/analysis use."""
    Z = code.Z
    H = np.zeros((code.m_b * Z, code.n_b * Z), np.uint8)
    for i, j, s in code.H_rows:
        H[i * Z:(i + 1) * Z, j * Z:(j + 1) * Z] = _lift_block(s, Z)
    return H


# --------------------------------------------------------------------------
# decoder (the reference instantiates LDPC5GDecoder at
# esn_ofdm_mimo_via_cdl.py:69 but never calls it; implemented here for
# component completeness and round-trip validation)
# --------------------------------------------------------------------------

def _nr_index_tensors(code: NrCode):
    """Padded dense check->variable index tensors for the irregular lifted
    graph: (M, Dc) variable indices per lifted check, padded with the
    sentinel variable N_full whose LLR is pinned huge-positive (tanh -> 1 is
    the neutral element of the check product; its decision 0 is neutral in
    the syndrome)."""
    Z = code.Z
    by_row: dict = {}
    for i, j, s in code.H_rows:
        by_row.setdefault(i, []).append((j, s))
    Dc = max(len(v) for v in by_row.values())
    M = code.m_b * Z
    N_full = code.n_b * Z
    idx = np.full((M, Dc), N_full, np.int32)
    for i, cols in by_row.items():
        for t, (j, s) in enumerate(cols):
            z = np.arange(Z)
            idx[i * Z + np.arange(Z), t] = j * Z + (z + s) % Z
    return idx, N_full


def nr_derate_llrs(code: NrCode, llr_e):
    """Rate-recovery (§5.4.2 inverse, rv0): scatter received LLRs back to
    the N_full codeword positions — punctured bits get 0 (unknown), filler
    bits get a huge positive LLR (known zero), repeated positions add."""
    import jax.numpy as jnp
    B = llr_e.shape[0]
    N_full = code.n_b * code.Z
    full = jnp.zeros((B, N_full), jnp.float32)
    full = full.at[:, jnp.asarray(code.sel)].add(llr_e.astype(jnp.float32))
    if code.F:
        full = full.at[:, code.k:code.K].set(1e4)
    return full


def nr_decode_bp(code: NrCode, llr_e, max_iter: int = 20):
    """Flooding sum-product BP on the irregular lifted graph; returns
    (u_hat (B, k) int8, converged (B,) bool). llr_e (B, E) rate-matched
    channel LLRs (positive <=> bit 0). Same message semantics as
    ldpc/decode.py (clip +-16, per-codeword syndrome stop)."""
    import jax
    import jax.numpy as jnp
    idx_np, N_full = _nr_index_tensors(code)
    idx = jnp.asarray(idx_np)
    Lc = nr_derate_llrs(code, llr_e)
    B = Lc.shape[0]
    # sentinel variable: huge LLR -> tanh=1 neutral, decision 0
    Lc = jnp.concatenate([Lc, jnp.full((B, 1), 1e4, jnp.float32)], axis=1)
    M, Dc = idx.shape
    clip = 16.0

    def posterior(r):
        acc = jnp.zeros((B, N_full + 1), jnp.float32)
        return Lc + acc.at[:, idx.reshape(-1)].add(
            r.reshape(B, -1)).at[:, N_full].set(0.0)

    from .decode import _leave_one_out_prod

    def step(carry, _):
        r, done, bits = carry
        L = posterior(r)
        q = jnp.clip(L[:, idx] - r, -clip, clip)          # (B, M, Dc)
        t = jnp.tanh(0.5 * q)
        # exact leave-one-out product along the slot axis (cumprods — no
        # division: punctured bits start at LLR 0, i.e. t = 0)
        loo = _leave_one_out_prod(t)
        p = jnp.clip(loo, -0.9999999, 0.9999999)
        r_new = jnp.log1p(p) - jnp.log1p(-p)
        L_new = posterior(r_new)
        d = (L_new < 0).astype(jnp.int32)                 # (B, N_full+1)
        par = jnp.sum(d[:, idx], axis=-1) % 2             # (B, M)
        ok = jnp.all(par == 0, axis=-1)
        bits = jnp.where(done[:, None], bits, d[:, :N_full])
        newly = ok & ~done
        bits = jnp.where(newly[:, None], d[:, :N_full], bits)
        return (r_new, done | ok, bits), None

    r0 = jnp.zeros((B, M, Dc), jnp.float32)
    d0 = (Lc < 0).astype(jnp.int32)
    (r, done, bits), _ = jax.lax.scan(
        step, (r0, jnp.zeros((B,), bool), d0[:, :N_full]), None,
        length=max_iter)
    return bits[:, :code.k].astype(jnp.int8), done

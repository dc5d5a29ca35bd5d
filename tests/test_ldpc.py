"""LDPC construction/encode/decode tests: algebraic properties, error
correction, and a small AWGN waterfall sanity check."""
import numpy as np
import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.ldpc import (
    make_regular_ldpc, ldpc_encode, ldpc_decode_bp, llr_from_yobs)
from esn_ofdm_mimo_tpu.ldpc.encode import ldpc_extract_message


def test_code_structure():
    code = make_regular_ldpc(512, 4, 8, seed=0)
    assert code.n == 512
    # rank-trimmed Gallager: m = n/2 - (rank deficiency ~ dv-1)
    assert code.n // 2 - 4 <= code.m <= code.n // 2
    assert code.k == code.n - code.m
    assert 0.5 <= code.k / code.n <= 0.52     # reference prints rate ~0.5
    # column weights dv (minus dropped rows), row weights dc
    assert code.H.sum(axis=0).max() <= code.dv
    assert np.median(code.H.sum(axis=0)) == code.dv
    assert code.H.sum(axis=1).max() <= code.dc
    # full row rank by construction
    assert code.H.shape == (code.m, code.n)


def test_encode_satisfies_parity():
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(8, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u)))
    assert cw.shape == (8, code.n)
    syn = (code.H.astype(np.int64) @ cw.T) % 2
    assert np.all(syn == 0)
    # systematic: message is the tail slice
    msg = np.asarray(ldpc_extract_message(code, jnp.asarray(cw)))
    np.testing.assert_array_equal(msg, u)


def test_decode_noiseless_and_flips():
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, size=(4, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float32)
    # BPSK LLR: bit0 -> +A, bit1 -> -A
    llr = (1 - 2 * cw) * 10.0
    # flip 8 random bits per codeword
    llr_flip = llr.copy()
    for b in range(4):
        idx = rng.choice(code.n, size=8, replace=False)
        llr_flip[b, idx] *= -1
    d = np.asarray(ldpc_decode_bp(code, jnp.asarray(llr_flip), max_iter=50))
    np.testing.assert_array_equal(d, cw.astype(np.int8))


def test_decode_awgn_waterfall():
    """Coded BER over BPSK/AWGN must crush raw BER at ~3 dB Eb/N0."""
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(2)
    B = 32
    u = rng.integers(0, 2, size=(B, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    rate = code.k / code.n
    ebno_db = 3.0
    sigma = np.sqrt(1.0 / (2 * rate * 10 ** (ebno_db / 10)))
    x = 1 - 2 * cw
    y = x + sigma * rng.standard_normal(x.shape)
    raw_ber = np.mean((y < 0) != (cw > 0.5))
    llr = 2 * y / sigma**2
    d = np.asarray(ldpc_decode_bp(code, jnp.asarray(llr, dtype=jnp.float32),
                                  max_iter=60))
    msg = d[:, code.m:]
    coded_ber = np.mean(msg != u)
    assert raw_ber > 0.01
    assert coded_ber < raw_ber / 10


def test_llr_from_yobs_pyldpc_contract():
    y = jnp.asarray([1.0, -2.0])
    got = np.asarray(llr_from_yobs(y, 1.0))
    np.testing.assert_allclose(got, 2 * np.asarray(y) / 10 ** (-0.1), rtol=1e-6)


def test_minsum_decoder_corrects_errors():
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, size=(4, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float32)
    llr = (1 - 2 * cw) * 8.0
    for b in range(4):
        idx = rng.choice(code.n, size=8, replace=False)
        llr[b, idx] *= -1
    d = np.asarray(ldpc_decode_bp(code, jnp.asarray(llr), max_iter=50,
                                  algo="minsum"))
    np.testing.assert_array_equal(d, cw.astype(np.int8))


def test_minsum_close_to_sumprod_on_awgn():
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(6)
    B = 24
    u = rng.integers(0, 2, size=(B, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    rate = code.k / code.n
    sigma = np.sqrt(1.0 / (2 * rate * 10 ** (3.0 / 10)))
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray(2 * y / sigma**2, dtype=jnp.float32)
    ber_sp = np.mean(np.asarray(ldpc_decode_bp(code, llr, 60))[:, code.m:] != u)
    ber_ms = np.mean(np.asarray(
        ldpc_decode_bp(code, llr, 60, algo="minsum"))[:, code.m:] != u)
    assert ber_ms < max(3 * ber_sp, 0.01)


def test_decode_early_termination_stats():
    """return_stats reports per-codeword convergence iteration: clean
    codewords 0 iterations, lightly corrupted a few, garbage never."""
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, size=(3, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float32)
    llr = (1 - 2 * cw) * 10.0
    llr[1, rng.choice(code.n, size=8, replace=False)] *= -1   # few flips
    llr[2] = rng.normal(size=code.n).astype(np.float32) * 0.1  # garbage
    d, stats = ldpc_decode_bp(code, jnp.asarray(llr), max_iter=30,
                              return_stats=True)
    it = np.asarray(stats["iterations"])
    conv = np.asarray(stats["converged"])
    assert it[0] == 0 and conv[0]
    assert 0 < it[1] <= 30 and conv[1]
    assert np.array_equal(np.asarray(d[:2]), cw[:2].astype(np.int8))
    if not conv[2]:
        assert it[2] == 30


def test_pyldpc_family_construction_and_decode():
    """Construction-faithful pyldpc replica (VERDICT r02 #10): exact strip
    structure, FULL decode graph (no row trim — pyldpc decodes with the
    dependent rows), same rate as the other families, and BP at least as
    good as the trimmed-graph Gallager draw at a waterfall point (the
    redundant checks can only help)."""
    import numpy as np
    import jax.numpy as jnp
    from esn_ofdm_mimo_tpu.ldpc import (make_pyldpc_ldpc, make_regular_ldpc,
                                        ldpc_encode, ldpc_decode_bp)

    c = make_pyldpc_ldpc(512)
    g = make_regular_ldpc(512)
    assert c.H.shape[0] == 512 * c.dv // c.dc      # full, untrimmed
    assert c.m == g.m and c.k == g.k               # same rank/rate profile
    assert (c.H.sum(axis=1) == c.dc).all()
    assert (c.H.sum(axis=0) == c.dv).all()

    rng = np.random.default_rng(5)
    errs = {}
    for name, code in (("pyldpc", c), ("gallager", g)):
        u = rng.integers(0, 2, (256, code.k))
        cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
        assert ((code.H.astype(np.int64)
                 @ cw.astype(np.int64).T) % 2).sum() == 0
        rate = code.k / code.n
        sigma = np.sqrt(1.0 / (2 * rate * 10 ** (2.0 / 10)))
        y = 1.0 - 2.0 * cw + sigma * rng.normal(size=cw.shape)
        llr = (2.0 * y / sigma ** 2).astype(np.float32)
        d = np.asarray(ldpc_decode_bp(code, jnp.asarray(llr), 50))
        errs[name] = float((d[:, code.m:] != u).mean())
    assert errs["pyldpc"] <= errs["gallager"] * 1.5 + 5e-3, errs


def test_offset_minsum_decoder_corrects_errors():
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, size=(4, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float32)
    llr = (1 - 2 * cw) * 8.0
    for b in range(4):
        idx = rng.choice(code.n, size=8, replace=False)
        llr[b, idx] *= -1
    d = np.asarray(ldpc_decode_bp(code, jnp.asarray(llr), max_iter=50,
                                  algo="offset-minsum", minsum_offset=0.5))
    np.testing.assert_array_equal(d, cw.astype(np.int8))


def test_offset_minsum_zero_offset_equals_unit_scale_minsum():
    """β=0 offset min-sum IS min-sum at scale 1.0 (same ops, exactly)."""
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(7)
    B = 8
    u = rng.integers(0, 2, size=(B, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    rate = code.k / code.n
    sigma = np.sqrt(1.0 / (2 * rate * 10 ** (2.0 / 10)))
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray(2 * y / sigma**2, dtype=jnp.float32)
    d_off = np.asarray(ldpc_decode_bp(code, llr, 30, algo="offset-minsum",
                                      minsum_offset=0.0))
    d_ms = np.asarray(ldpc_decode_bp(code, llr, 30, algo="minsum",
                                     minsum_scale=1.0))
    np.testing.assert_array_equal(d_off, d_ms)


def test_offset_minsum_close_to_sumprod_on_awgn():
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(6)
    B = 24
    u = rng.integers(0, 2, size=(B, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    rate = code.k / code.n
    sigma = np.sqrt(1.0 / (2 * rate * 10 ** (3.0 / 10)))
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray(2 * y / sigma**2, dtype=jnp.float32)
    ber_sp = np.mean(np.asarray(ldpc_decode_bp(code, llr, 60))[:, code.m:] != u)
    ber_om = np.mean(np.asarray(
        ldpc_decode_bp(code, llr, 60, algo="offset-minsum",
                       minsum_offset=0.5))[:, code.m:] != u)
    assert ber_om < max(3 * ber_sp, 0.01)

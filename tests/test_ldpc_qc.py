"""QC-LDPC: construction properties, XLA-graph equivalence of the Pallas
kernel (interpret mode), and coded-BER parity with the Gallager draw."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esn_ofdm_mimo_tpu.ldpc import (
    make_qc_ldpc, make_regular_ldpc, ldpc_encode, ldpc_decode_bp)
from esn_ofdm_mimo_tpu.ldpc.decode import _decode_bp_graph


def test_qc_construction_regular_and_girth():
    code = make_qc_ldpc(512)
    qc = code.qc
    Z = qc.Z
    assert Z == 64 and code.n == 512
    # same rank/rate profile as the Gallager ensemble draw
    g = make_regular_ldpc(512)
    assert code.m == g.m and code.k == g.k
    # full lifted graph is perfectly (dv, dc)-regular
    assert qc.ck_cols_nat.shape == (code.dv * Z, code.dc)
    assert (qc.ck_cols_nat < code.n).all()
    assert (qc.var_edge_nat < code.dv * Z * code.dc).all()
    # girth >= 6: no 4-cycles in the base-shift table (Fossorier)
    s = qc.shifts.astype(np.int64)
    for i1 in range(code.dv):
        for i2 in range(i1 + 1, code.dv):
            d = (s[i1] - s[i2]) % Z
            assert len(np.unique(d)) == code.dc, (i1, i2)


def test_qc_encode_satisfies_both_views():
    code = make_qc_ldpc(512)
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, size=(8, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u)))
    assert ((code.H.astype(np.int64) @ cw.T) % 2).sum() == 0
    # natural order satisfies every lifted check (incl. redundant rows)
    cw_nat = np.empty_like(cw)
    cw_nat[:, code.qc.perm] = cw
    par = cw_nat[:, code.qc.ck_cols_nat].sum(axis=-1) % 2  # (8, dv*Z)
    assert par.sum() == 0


def _awgn_llrs(code, B, ebno_db, seed):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 2, size=(B, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    rate = code.k / code.n
    sigma = np.sqrt(1.0 / (2 * rate * 10 ** (ebno_db / 10)))
    x = 1.0 - 2.0 * cw
    y = x + sigma * rng.normal(size=x.shape)
    return u, (2.0 * y / sigma**2).astype(np.float32)


@pytest.mark.parametrize("algo", ["sumprod", "minsum", "offset-minsum"])
@pytest.mark.slow
def test_pallas_kernel_matches_xla_graph(algo):
    """Kernel (interpret mode) vs the XLA decoder on the same full graph."""
    from esn_ofdm_mimo_tpu.ldpc import decode_pallas

    code = make_qc_ldpc(512)
    qc = code.qc
    B = 24
    _, llr = _awgn_llrs(code, B, 2.5, seed=11)

    # XLA decode on the full natural-order lifted graph
    llr_nat = jnp.asarray(llr)[:, jnp.asarray(qc.inv_perm)]
    ref_bits_nat, ref_stats = _decode_bp_graph(
        jnp.asarray(qc.ck_cols_nat), jnp.asarray(qc.var_edge_nat),
        llr_nat, 25, algo, 0.75, True)
    want = np.asarray(ref_bits_nat)[:, qc.perm]

    with jax.disable_jit():  # pallas interpret path under the hood
        import jax.experimental.pallas as pl  # noqa: F401
        from unittest import mock
        orig = pl.pallas_call

        def interp_call(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(decode_pallas.pl, "pallas_call", interp_call):
            bits, stats = decode_pallas.ldpc_decode_bp_pallas(
                code, jnp.asarray(llr), 25, algo, 0.75, True)

    bits = np.asarray(bits)
    assert (bits == want).mean() > 0.999  # float-assoc tolerance
    ref_it = np.asarray(ref_stats["iterations"])
    got_it = np.asarray(stats["iterations"])
    assert (ref_it == got_it).mean() > 0.9
    assert (np.asarray(ref_stats["converged"])
            == np.asarray(stats["converged"])).mean() > 0.95


def test_qc_coded_ber_not_worse_than_gallager():
    """Same-ensemble BER sanity at a mid-waterfall point."""
    qc_code = make_qc_ldpc(512)
    g_code = make_regular_ldpc(512)
    B = 256
    errs = {}
    for name, code in (("qc", qc_code), ("gallager", g_code)):
        u, llr = _awgn_llrs(code, B, 2.0, seed=5)
        d = np.asarray(ldpc_decode_bp(code, jnp.asarray(llr), 50))
        errs[name] = float((d[:, code.m:] != u).mean())
    # waterfall statistical band: QC's girth-conditioned graph should be
    # at least as good; allow generous sampling slack
    assert errs["qc"] <= errs["gallager"] * 1.5 + 5e-3, errs


def test_qc_decode_with_traced_max_iter(monkeypatch):
    """A traced iteration cap (the NBF doubled-below-6dB rule under a traced
    Eb/N0) must not crash the QC dispatch — it falls back to the XLA
    decoder, whose while_loop takes a dynamic bound."""
    monkeypatch.setenv("LDPC_TPU_IMPL", "pallas")
    import importlib
    from esn_ofdm_mimo_tpu.ldpc import decode as dec
    importlib.reload(dec)
    try:
        code = make_qc_ldpc(64)
        cw = jnp.zeros((3, code.n), jnp.float32)       # all-zero codeword
        llr = 8.0 * (1.0 - 2.0 * cw)                   # confident zeros

        @jax.jit
        def f(ebno_db):
            mi = jnp.where(ebno_db >= 6.0, 10, 20)
            bits = dec.ldpc_decode_bp(code, llr, mi)
            return jnp.sum(bits.astype(jnp.int32))
        assert int(f(jnp.float32(3.0))) == 0
        assert int(f(jnp.float32(12.0))) == 0
    finally:
        # drop the env var BEFORE the restore-reload: the reload re-reads
        # LDPC_TPU_IMPL at module level, and monkeypatch teardown runs
        # after this finally block
        monkeypatch.delenv("LDPC_TPU_IMPL", raising=False)
        importlib.reload(dec)


@pytest.mark.parametrize("algo", ["sumprod", "minsum", "offset-minsum"])
@pytest.mark.slow
def test_pallas_layered_matches_xla_layered(algo):
    """Layered-schedule kernel (interpret mode) vs the XLA layered decoder."""
    from unittest import mock
    from esn_ofdm_mimo_tpu.ldpc import decode_pallas
    from esn_ofdm_mimo_tpu.ldpc.decode import _decode_bp_qc_layered

    code = make_qc_ldpc(512)
    qc = code.qc
    B = 24
    _, llr = _awgn_llrs(code, B, 2.5, seed=17)

    llr_nat = jnp.asarray(llr)[:, jnp.asarray(qc.inv_perm)]
    ref_bits_nat, ref_stats = _decode_bp_qc_layered(
        code, llr_nat, 15, algo, 0.75, True)
    want = np.asarray(ref_bits_nat)[:, qc.perm]

    with jax.disable_jit():
        import jax.experimental.pallas as pl  # noqa: F401
        orig = pl.pallas_call

        def interp_call(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(decode_pallas.pl, "pallas_call", interp_call):
            bits, stats = decode_pallas.ldpc_decode_bp_pallas(
                code, jnp.asarray(llr), 15, algo, 0.75, True,
                schedule="layered")

    assert (np.asarray(bits) == want).mean() > 0.999
    ref_it = np.asarray(ref_stats["iterations"])
    got_it = np.asarray(stats["iterations"])
    assert (ref_it == got_it).mean() > 0.9
    assert (np.asarray(ref_stats["converged"])
            == np.asarray(stats["converged"])).mean() > 0.95


def test_layered_half_budget_matches_flooding_ber():
    """Serial-C layered at max_iter=K tracks flooding at 2K: information
    propagates ~2x faster per sweep (the schedule the decode-bound presets
    run, LdpcConfig.schedule='layered' + halved max_iter)."""
    code = make_qc_ldpc(512)
    B = 384
    u, llr = _awgn_llrs(code, B, 2.0, seed=23)
    res = {}
    for sched, mi in (("flooding", 50), ("layered", 25)):
        d, st = ldpc_decode_bp(code, jnp.asarray(llr), mi, schedule=sched,
                               return_stats=True)
        d = np.asarray(d)
        it = np.asarray(st["iterations"])
        conv = np.asarray(st["converged"])
        res[sched] = (float((d[:, code.m:] != u).mean()),
                      float(it[conv].mean()), float(conv.mean()))
    ber_f, it_f, conv_f = res["flooding"]
    ber_l, it_l, conv_l = res["layered"]
    # equal-BER band (sampling slack) at half the sweeps
    assert ber_l <= ber_f * 1.25 + 2e-3, res
    assert conv_l >= conv_f - 0.02, res
    assert it_l <= 0.65 * it_f, res     # ~2x faster convergence


def test_layered_requires_qc():
    g = make_regular_ldpc(256)
    with pytest.raises(ValueError):
        ldpc_decode_bp(g, jnp.zeros((2, 256), jnp.float32), 5,
                       schedule="layered")


def test_layered_traced_max_iter_and_cap():
    """Traced budgets flow through both layered paths: the XLA while_loop
    takes the dynamic bound directly; the kernel runs it as an iter_cap."""
    code = make_qc_ldpc(64)
    cw = jnp.zeros((3, code.n), jnp.float32)
    llr = 8.0 * (1.0 - 2.0 * cw)

    @jax.jit
    def f(ebno_db):
        mi = jnp.where(ebno_db >= 6.0, 10, 20)
        bits = ldpc_decode_bp(code, llr, mi, schedule="layered",
                              max_iter_bound=20)
        return jnp.sum(bits.astype(jnp.int32))
    assert int(f(jnp.float32(3.0))) == 0
    assert int(f(jnp.float32(12.0))) == 0


@pytest.mark.parametrize("cap", [0, 7, 25])
@pytest.mark.slow
def test_pallas_traced_iter_cap_matches_xla_budget(cap):
    """The kernel compiled at a static 25-iteration bound with a TRACED
    runtime cap must reproduce the XLA decoder run at exactly `cap`
    iterations — the mechanism that puts the NBF below-6dB doubled budget
    (a traced max_iter) on the fused kernel."""
    from unittest import mock
    from esn_ofdm_mimo_tpu.ldpc import decode_pallas

    code = make_qc_ldpc(512)
    qc = code.qc
    B = 24
    _, llr = _awgn_llrs(code, B, 2.5, seed=13)

    llr_nat = jnp.asarray(llr)[:, jnp.asarray(qc.inv_perm)]
    ref_bits_nat, ref_stats = _decode_bp_graph(
        jnp.asarray(qc.ck_cols_nat), jnp.asarray(qc.var_edge_nat),
        llr_nat, cap, "sumprod", 0.75, True)
    want = np.asarray(ref_bits_nat)[:, qc.perm]

    with jax.disable_jit():
        import jax.experimental.pallas as pl  # noqa: F401
        orig = pl.pallas_call

        def interp_call(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(decode_pallas.pl, "pallas_call", interp_call):
            bits, stats = decode_pallas.ldpc_decode_bp_pallas(
                code, jnp.asarray(llr), 25, "sumprod", 0.75, True,
                iter_cap=jnp.int32(cap))

    assert (np.asarray(bits) == want).mean() > 0.999
    ref_it = np.asarray(ref_stats["iterations"])
    got_it = np.asarray(stats["iterations"])
    assert (ref_it == got_it).mean() > 0.9, (ref_it, got_it)


@pytest.mark.slow
def test_two_pass_compaction_is_bit_exact():
    """pass1_iters straggler compaction must reproduce the single-pass
    decode EXACTLY — bits, iteration counts and convergence flags — since
    per-codeword BP trajectories are deterministic and converged decisions
    freeze at the first zero syndrome (the preset-default perf mode,
    LdpcConfig.pass1_iters)."""
    from unittest import mock
    from esn_ofdm_mimo_tpu.ldpc import decode_pallas

    code = make_qc_ldpc(512)
    B = 48
    _, llr = _awgn_llrs(code, B, 2.0, seed=31)  # mix of fast/slow/stuck cws

    with jax.disable_jit():
        import jax.experimental.pallas as pl  # noqa: F401
        orig = pl.pallas_call

        def interp_call(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(decode_pallas.pl, "pallas_call", interp_call):
            b1, s1 = decode_pallas.ldpc_decode_bp_pallas(
                code, jnp.asarray(llr), 25, "sumprod", 0.75, True)
            b2, s2 = decode_pallas.ldpc_decode_bp_pallas(
                code, jnp.asarray(llr), 25, "sumprod", 0.75, True,
                pass1_iters=6)

    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(s1["iterations"]),
                                  np.asarray(s2["iterations"]))
    np.testing.assert_array_equal(np.asarray(s1["converged"]),
                                  np.asarray(s2["converged"]))
    # the pass-1 budget actually split the batch (some converged by 6,
    # some did not) — otherwise this test exercises nothing
    it = np.asarray(s1["iterations"])
    assert (it <= 6).any() and (it > 6).any()


@pytest.mark.slow
def test_counts_mode_matches_bits_mode():
    """ldpc_decode_bp_pallas_counts (transposed-domain error counting, the
    Monte-Carlo pipelines' path) must agree exactly with decoding bits and
    comparing — with and without two-pass compaction (whose pass-2 re-entry
    for converged lanes is constant +PAD in counts mode: their results are
    discarded, so stragglers' trajectories are unchanged)."""
    from unittest import mock
    from esn_ofdm_mimo_tpu.ldpc import decode_pallas, ldpc_encode

    code = make_qc_ldpc(512)
    B = 48
    u, llr = _awgn_llrs(code, B, 2.0, seed=77)

    with jax.disable_jit():
        import jax.experimental.pallas as pl  # noqa: F401
        orig = pl.pallas_call

        def interp_call(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(decode_pallas.pl, "pallas_call", interp_call):
            bits, s_b = decode_pallas.ldpc_decode_bp_pallas(
                code, jnp.asarray(llr), 25, "sumprod", 0.75, True,
                pass1_iters=6)
            err, s_c = decode_pallas.ldpc_decode_bp_pallas_counts(
                code, jnp.asarray(llr), jnp.asarray(u), 25,
                "sumprod", 0.75, pass1_iters=6)
            err_np, s_n = decode_pallas.ldpc_decode_bp_pallas_counts(
                code, jnp.asarray(llr), jnp.asarray(u), 25,
                "sumprod", 0.75, pass1_iters=None)

    want = (np.asarray(bits)[:, code.m:] != u).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(err), want)
    np.testing.assert_array_equal(np.asarray(err_np), want)
    np.testing.assert_array_equal(np.asarray(s_b["iterations"]),
                                  np.asarray(s_c["iterations"]))
    np.testing.assert_array_equal(np.asarray(s_b["converged"]),
                                  np.asarray(s_c["converged"]))
    assert (want > 0).any() and (want == 0).any()   # both outcomes present

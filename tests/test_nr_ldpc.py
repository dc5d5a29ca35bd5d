"""38.212 NR LDPC encoder: lifted-graph parity, spec selection rules, rate
matching (reference component: LDPC5GEncoder, esn_ofdm_mimo_via_cdl.py:68)."""
import numpy as np
import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.ldpc import nr


def test_lifting_table_and_sets():
    # Table 5.3.2-1: Z = a * 2^j, a in {2,3,5,7,9,11,13,15}, Z <= 384
    assert nr.LIFT_SIZES[0] == 2 and nr.LIFT_SIZES[-1] == 384
    assert 160 in nr.LIFT_SIZES and 288 in nr.LIFT_SIZES
    assert 384 in nr.LIFT_SIZES
    assert nr.lifting_set(160) == 2          # 160 = 5 * 32 -> a=5 set
    assert nr.lifting_set(256) == 0          # 2 * 128
    assert nr.lifting_set(15) == 7


def test_basegraph_selection_rules():
    # §7.2.2 boundaries
    assert nr.select_basegraph(292, 0.9) == 2        # tiny block
    assert nr.select_basegraph(293, 0.9) == 1
    assert nr.select_basegraph(3824, 0.67) == 2      # medium block, low rate
    assert nr.select_basegraph(3825, 0.5) == 1
    assert nr.select_basegraph(8000, 0.25) == 2      # very low rate
    assert nr.select_basegraph(8000, 0.26) == 1
    # kb rule (BG2)
    assert nr.bg_kb(2, 641) == 10
    assert nr.bg_kb(2, 640) == 9
    assert nr.bg_kb(2, 560) == 8
    assert nr.bg_kb(2, 192) == 6
    assert nr.bg_kb(1, 1) == 22


def test_sm1_code_resolution():
    """The reference sm1 call shape: LDPC5GEncoder(1536, 3072)."""
    code = nr.make_nr_ldpc(1536, 3072)
    assert code.bg == 2
    assert code.Z == 160            # min Z with 10*Z >= 1536
    assert code.K == 1600 and code.F == 64
    assert code.m_b == 42 and code.n_b == 52
    assert code.sel.shape == (3072,)
    # rv0 starts right after the 2Z punctured systematic bits
    assert code.sel[0] == 2 * code.Z
    # filler positions are never transmitted
    assert not np.any((code.sel >= code.k) & (code.sel < code.K))


def test_lifted_parity_check_holds():
    """H @ c^T = 0 on the FULL lifted graph for random payloads."""
    code = nr.make_nr_ldpc(1536, 3072)
    H = nr.nr_lifted_H(code)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(4, code.k))
    u_pad = np.concatenate(
        [u, np.zeros((4, code.F), dtype=u.dtype)], axis=1)
    p = (u_pad @ code.M.T) % 2
    c = np.concatenate([u_pad, p], axis=1)
    syn = (c @ H.T) % 2
    assert not syn.any()


def test_encode_matches_host_and_bit_law():
    code = nr.make_nr_ldpc(1536, 3072)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, size=(8, code.k))
    e = np.asarray(nr.nr_encode(code, jnp.asarray(u)))
    assert e.shape == (8, 3072)
    # device encode equals host encode through the same selection
    u_pad = np.concatenate([u, np.zeros((8, code.F), dtype=u.dtype)], axis=1)
    p = (u_pad @ code.M.T) % 2
    c = np.concatenate([u_pad, p], axis=1)
    assert np.array_equal(e, c[:, code.sel])
    # uniform info bits -> (near-)uniform codeword bit law: the property the
    # sm1 SER-parity argument rests on (PARITY.md)
    assert abs(e.mean() - 0.5) < 0.02
    # systematic prefix: the first transmitted bits are the payload after
    # the 2Z puncture
    assert np.array_equal(e[:, 0], u[:, 2 * code.Z])


def test_qm_interleaver_round_trip():
    code = nr.make_nr_ldpc(1536, 3072)
    u = jnp.asarray(np.random.default_rng(2).integers(0, 2, (2, code.k)))
    plain = np.asarray(nr.nr_encode(code, u))
    inter = np.asarray(nr.nr_encode(code, u, interleave_qm=4))
    E, Qm = code.E, 4
    # §5.4.2.2: write row-wise into Qm rows, read column-wise
    undone = inter.reshape(2, E // Qm, Qm).transpose(0, 2, 1).reshape(2, E)
    assert np.array_equal(undone, plain)


def test_bg1_constructs_and_checks():
    code = nr.make_nr_ldpc(4000, 6000)     # K>3824, R=0.67 -> BG1
    assert code.bg == 1 and code.m_b == 46 and code.n_b == 68
    H = nr.nr_lifted_H(code)
    u = np.random.default_rng(3).integers(0, 2, size=(2, code.k))
    u_pad = np.concatenate([u, np.zeros((2, code.F), dtype=u.dtype)], axis=1)
    p = (u_pad @ code.M.T) % 2
    c = np.concatenate([u_pad, p], axis=1)
    assert not ((c @ H.T) % 2).any()


def test_nr_decoder_round_trip_and_correction():
    """Encoder->AWGN->BP decoder round trip: exact recovery at high SNR,
    real coding gain at the waterfall (the component pair the reference
    instantiates at esn_ofdm_mimo_via_cdl.py:68-69)."""
    code = nr.make_nr_ldpc(1536, 3072)
    rng = np.random.default_rng(4)
    B = 8
    u = rng.integers(0, 2, size=(B, code.k))
    e = np.asarray(nr.nr_encode(code, jnp.asarray(u))).astype(np.float64)
    rate = code.k / code.E

    def llrs(snr_db, seed):
        nrng = np.random.default_rng(seed)
        sigma = np.sqrt(1.0 / (2 * rate * 10 ** (snr_db / 10)))
        y = 1.0 - 2.0 * e + sigma * nrng.normal(size=e.shape)
        return jnp.asarray((2.0 * y / sigma**2).astype(np.float32))

    # high SNR: exact recovery, converged flags set
    u_hat, done = nr.nr_decode_bp(code, llrs(6.0, 0), max_iter=30)
    assert bool(np.all(done))
    np.testing.assert_array_equal(np.asarray(u_hat), u)

    # waterfall: decoder beats the raw channel decisions clearly
    L = llrs(2.0, 1)
    u_hat, _ = nr.nr_decode_bp(code, L, max_iter=30)
    # uncoded reference: hard decisions on the systematic positions
    sys_pos = np.where(np.asarray(code.sel) < code.k)[0]
    raw = (np.asarray(L)[:, sys_pos] < 0).astype(np.int8)
    raw_ber = (raw != u[:, np.asarray(code.sel)[sys_pos]]).mean()
    dec_ber = (np.asarray(u_hat) != u).mean()
    assert raw_ber > 0.01            # the channel actually errs
    assert dec_ber < raw_ber / 5     # and BP corrects most of it


def test_basegraph_table_invariants_and_fingerprint():
    """Data-validation hook for the base-graph tables (VERDICT r04 #5).

    Asserts the structural invariants ANY valid 38.212 table set must
    satisfy, so dropping the true Tables 5.3.2-2/-3 into _BG_TABLES later
    is a verified one-line data change: these checks must keep passing,
    while the pinned surrogate fingerprint below must be UPDATED (and
    BG_TABLES_SOURCE flipped to "ts38212")."""
    for bg, (m_b_exp, n_b_exp, kb_exp) in nr._BG_DIMS.items():
        entries, (m_b, n_b, kb) = nr._BG_TABLES[bg]
        assert (m_b, n_b, kb) == (m_b_exp, n_b_exp, kb_exp)
        rows = {i for i, _ in entries}
        cols = {j for _, j in entries}
        assert rows == set(range(m_b))
        assert max(cols) < kb + m_b        # base matrix is m_b x (kb + m_b)
        for (i, j), shifts in entries.items():
            assert 0 <= i < m_b and 0 <= j < kb + m_b
            assert shifts.shape == (8,)
            # shifts live in [0, 384): every lifted graph reduces them mod Z
            assert int(shifts.min()) >= 0 and int(shifts.max()) < 384
        # NR core skeleton: double diagonal over parity cols kb..kb+3 with
        # the weight-3 first parity column (shift 1 in its top entry)
        assert (0, kb) in entries and int(entries[(0, kb)][0]) == 1
        for (i, j) in [(0, kb + 1), (1, kb), (1, kb + 1), (1, kb + 2),
                       (2, kb + 2), (2, kb + 3), (3, kb), (3, kb + 3)]:
            assert (i, j) in entries
        # extension rows carry exactly one identity column each, and no
        # entries to the right of it (lower-triangular extension)
        for e in range(m_b - 4):
            i = 4 + e
            assert (i, kb + 4 + e) in entries
            assert all(j <= kb + 4 + e for (ri, j) in entries if ri == i)
        # punctured high-degree columns 0 and 1 appear in all 4 core rows
        for i in range(4):
            assert (i, 0) in entries and (i, 1) in entries

    # pinned surrogate fingerprint: an accidental edit of the surrogate
    # data fails here; a deliberate true-table upgrade updates this pin
    assert nr.BG_TABLES_SOURCE == "surrogate"
    assert nr.basegraph_fingerprint() == "6e0522b9a8ebd5de"
    assert "SURROGATE" in nr.NR_SURROGATE_CAVEAT

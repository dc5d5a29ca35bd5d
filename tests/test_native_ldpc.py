"""JAX BP decoder vs the native C++ oracle: identical flooding semantics."""
import numpy as np
import jax.numpy as jnp
import pytest

from esn_ofdm_mimo_tpu.ldpc import make_regular_ldpc, ldpc_encode, ldpc_decode_bp
from esn_ofdm_mimo_tpu.native import ldpc_bp_decode_ref, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no native toolchain")


def test_jax_decoder_matches_cpp_oracle():
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(0)
    B = 16
    u = rng.integers(0, 2, size=(B, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    # moderate-noise LLRs: some codewords need several BP iterations
    llr = (1 - 2 * cw) * 4.0 + 2.0 * rng.standard_normal(cw.shape)
    d_jax = np.asarray(ldpc_decode_bp(code, jnp.asarray(llr, jnp.float32),
                                      max_iter=50))
    d_cpp = ldpc_bp_decode_ref(code, llr, max_iter=50)
    # identical flooding schedule + early exit => identical decisions except
    # for float32-vs-float64 borderline cases
    agree = np.mean(d_jax == d_cpp)
    assert agree > 0.999, agree


def test_cpp_minsum_corrects_errors():
    code = make_regular_ldpc(512, 4, 8, seed=0)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, size=(1, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)[0]
    llr = (1 - 2 * cw) * 8.0
    flip = rng.choice(code.n, 10, replace=False)
    llr[flip] *= -1
    d = ldpc_bp_decode_ref(code, llr[None], max_iter=50, min_sum=True)
    np.testing.assert_array_equal(d[0], cw.astype(np.int8))

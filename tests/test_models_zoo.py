"""Model zoo + classifiers: learning sanity tests (each model must beat
chance on a separable problem) and the classification pipeline end-to-end."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.models import zoo
from esn_ofdm_mimo_tpu.models.elm import init_elm, elm_fit, elm_predict
from esn_ofdm_mimo_tpu.models import classifiers as clf


def test_mlp_learns_linear_map():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((256, 4)).astype(np.float32)
    A = rng.standard_normal((4, 2)).astype(np.float32)
    Y = X @ A
    params = zoo.mlp_init(jax.random.PRNGKey(0), (4, 32, 2))
    res = zoo.train_regressor(zoo.mlp_apply, params, jnp.asarray(X),
                              jnp.asarray(Y), epochs=300, lr=1e-2)
    assert float(res.losses[-1]) < 0.1 * float(res.losses[0])


def test_cnn_shapes_and_training():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((4, 50, 2)).astype(np.float32)
    Y = np.roll(X, 1, axis=1)
    params = zoo.cnn_init(jax.random.PRNGKey(0), 2, 2, channels=(16,))
    out = zoo.cnn_apply(params, jnp.asarray(X))
    assert out.shape == (4, 50, 2)
    res = zoo.train_regressor(zoo.cnn_apply, params, jnp.asarray(X),
                              jnp.asarray(Y), epochs=200, lr=3e-3)
    assert float(res.losses[-1]) < float(res.losses[0])


def test_rnn_learns_delay():
    rng = np.random.default_rng(2)
    X = rng.standard_normal((8, 30, 1)).astype(np.float32)
    Y = np.concatenate([np.zeros((8, 1, 1), np.float32), X[:, :-1]], axis=1)
    params = zoo.rnn_init(jax.random.PRNGKey(0), 1, 16, 1)
    res = zoo.train_regressor(zoo.rnn_apply, params, jnp.asarray(X),
                              jnp.asarray(Y), epochs=400, lr=1e-2)
    assert float(res.losses[-1]) < 0.3 * float(res.losses[0])


def test_elm_fits_linear_map():
    rng = np.random.default_rng(3)
    X = rng.standard_normal((300, 4)).astype(np.float32)
    Y = (X @ rng.standard_normal((4, 2))).astype(np.float32)
    p = init_elm(jax.random.PRNGKey(0), 4, 100, 2)
    p = elm_fit(p, jnp.asarray(X), jnp.asarray(Y))
    err = np.mean((np.asarray(elm_predict(p, jnp.asarray(X))) - Y) ** 2)
    assert err < 0.05


def test_window_flatten():
    x = jnp.arange(12.0).reshape(1, 6, 2)
    w = zoo.window_flatten(x, window=3)
    assert w.shape == (1, 6, 6)
    # last window position contains x[t-2], x[t-1], x[t]
    np.testing.assert_allclose(np.asarray(w[0, 5]),
                               np.asarray(x[0, 3:6]).reshape(-1))
    np.testing.assert_allclose(np.asarray(w[0, 0, :4]), 0.0)  # causal pad


def _noisy_qam_dataset(n=3000, snr_db=14, seed=0):
    from esn_ofdm_mimo_tpu.ops.qam import qam_constellation
    rng = np.random.default_rng(seed)
    const = np.asarray(qam_constellation(4))
    labels = rng.integers(0, 16, n)
    z = const[labels]
    sigma = np.sqrt(10 ** (-snr_db / 10) / 2)
    z = z + sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x = np.stack([z.real, z.imag], -1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(labels)


def test_esn_classifier_beats_chance():
    x, y = _noisy_qam_dataset()
    p = clf.esn_classifier_init(jax.random.PRNGKey(0), n_res=200)

    def apply(tr, xx):
        return clf.esn_classifier_apply(
            p._replace(W_out=tr["W_out"], b_out=tr["b_out"]), xx)

    res = zoo.train_classifier(apply, clf.esn_classifier_trainable(p),
                               x[:2400], y[:2400], epochs=300, lr=3e-3)
    pred = jnp.argmax(apply(res.params, x[2400:]), -1)
    ser = float(jnp.mean((pred != y[2400:]).astype(jnp.float32)))
    assert ser < 0.2    # 16-QAM at 14 dB: traditional ~0.06, chance 0.94


def test_elm_classifier_near_traditional():
    x, y = _noisy_qam_dataset()
    p = clf.elm_classifier_init(jax.random.PRNGKey(1), n_hidden=300)
    p = clf.elm_classifier_fit(p, x[:2400], y[:2400])
    pred = clf.elm_classifier_predict(p, x[2400:])
    ser = float(jnp.mean((pred != y[2400:]).astype(jnp.float32)))
    z = x[2400:, 0] + 1j * x[2400:, 1]
    trad = clf.traditional_demap(z, 4)
    ser_trad = float(jnp.mean((trad != y[2400:]).astype(jnp.float32)))
    assert ser < ser_trad + 0.1


@pytest.mark.slow
def test_classification_pipeline_tiny():
    from esn_ofdm_mimo_tpu.config import (
        SimConfig, OfdmConfig, ChannelConfig, EsnConfig, LdpcConfig)
    from esn_ofdm_mimo_tpu.pipelines.classification import (
        make_equalized_dataset, split_dataset, train_and_evaluate_zoo)
    from esn_ofdm_mimo_tpu.utils.rng import block_keys
    cfg = SimConfig(
        name="clf_tiny",
        ofdm=OfdmConfig(n_subcarriers=32, bits_per_symbol=4, doppler_hz=3000.0),
        channel=ChannelConfig(kind="cdl_b", n_tx=2, n_rx=4),
        esn=EsnConfig(n_reservoir=40, train_ebno_fixed_db=None),
        ldpc=LdpcConfig(enabled=False),
        ebno_db=(18.0,))
    keys = block_keys(jax.random.PRNGKey(0), 0, jnp.arange(4, dtype=jnp.uint32))
    ds = make_equalized_dataset(cfg, jnp.float32(18.0), keys)
    train, test = split_dataset(ds, jax.random.PRNGKey(1))
    res = train_and_evaluate_zoo(cfg, train, test, jax.random.PRNGKey(2),
                                 epochs=60)
    assert set(res) == {"traditional", "esn", "deep_esn", "fnn", "cnn",
                        "rnn", "elm"}
    assert res["traditional"]["ser"] < 0.5
    assert res["elm"]["ser"] < 0.6


def test_train_classifier_l2_keys_preserve_frozen_weights():
    """Regression: with l2 > 0, the penalty must cover only l2_keys —
    penalizing everything hands Adam a gradient on stop_gradient-frozen
    entries (the fixed reservoir W_in) and decays them to zero, which
    silently zeroes the features and pins the model at chance level."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from esn_ofdm_mimo_tpu.models import classifiers as clf
    from esn_ofdm_mimo_tpu.models.zoo import train_classifier

    key = jax.random.PRNGKey(0)
    p = clf.esn_classifier_init(key, n_res=64, n_classes=4)
    params = {"W_in": p.W_in, "W_out": p.W_out, "b_out": p.b_out}
    # 4 well-separated clusters in the (re, im) plane
    centers = jnp.asarray([[1, 1], [1, -1], [-1, 1], [-1, -1]], jnp.float32)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (2048,), 0, 4)
    x = centers[labels] + 0.1 * jax.random.normal(
        jax.random.fold_in(key, 2), (2048, 2))
    out = train_classifier(clf.esn_classifier_apply_full, params, x, labels,
                           epochs=400, lr=1e-2, l2=5e-5, l2_keys=("W_out",))
    # frozen reservoir untouched
    np.testing.assert_array_equal(np.asarray(out.params["W_in"]),
                                  np.asarray(p.W_in))
    pred = jnp.argmax(clf.esn_classifier_apply_full(out.params, x), -1)
    assert float(jnp.mean((pred != labels).astype(jnp.float32))) < 0.05

"""InceptionV3-FID architecture: shapes, flow, loading, extractor wiring.

True-FID numbers need the trained weights (absent offline); these tests pin
everything else: the network runs end-to-end at the canonical geometry,
weight save/load round-trips, and the torch-state-dict converter maps
shapes correctly from a synthetic state_dict.
"""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpugan.eval import inception
from tpugan.eval.features import make_extractor


@pytest.fixture(scope="module")
def params():
    return inception.init_random(0)


@pytest.mark.slow
def test_forward_shapes(params, rng):
    x = jnp.asarray(rng.standard_normal((2, 299, 299, 3)).astype(np.float32))
    feat, logits = inception.forward(params, x)
    assert feat.shape == (2, inception.FEATURE_DIM)
    assert logits.shape == (2, inception.N_LOGITS)
    assert np.all(np.isfinite(np.asarray(feat)))


@pytest.mark.slow
def test_resize_and_small_input(params, rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    x = inception.resize_to_299(x)
    assert x.shape == (2, 299, 299, 3)
    feat, _ = inception.forward(params, x)
    assert feat.shape == (2, 2048)


@pytest.mark.slow
def test_deterministic(params, rng):
    x = jnp.asarray(rng.standard_normal((1, 299, 299, 3)).astype(np.float32))
    a, _ = inception.forward(params, x)
    b, _ = inception.forward(params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_weight_roundtrip_and_extractor(params, tmp_path, rng):
    path = str(tmp_path / "inception.pkl")
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)

    run = make_extractor(3, "inception", path)
    imgs = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    feat, probs = run(imgs, batch=2)
    assert feat.shape == (3, 2048) and probs.shape == (3, 1008)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)


def test_torch_state_dict_converter():
    """Synthetic state_dict with the torchvision naming/layout converts to
    correctly-shaped HWIO params for every conv in the net."""
    sd = {}
    for (path, cin, cout, kh, kw) in inception._conv_defs():
        sd[f"{path}.conv.weight"] = np.zeros((cout, cin, kh, kw), np.float32)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{path}.bn.{leaf}"] = np.zeros((cout,), np.float32)
    sd["fc.weight"] = np.zeros((inception.N_LOGITS, 2048), np.float32)
    sd["fc.bias"] = np.zeros((inception.N_LOGITS,), np.float32)

    out = inception.convert_torch_state_dict(sd)
    for (path, cin, cout, kh, kw) in inception._conv_defs():
        assert out[path]["w"].shape == (kh, kw, cin, cout), path
    assert out["fc"]["w"].shape == (2048, inception.N_LOGITS)


@pytest.mark.slow
def test_public_evaluate_with_inception_backend(params, tmp_path):
    """The day trained weights appear, the protocol is: convert-inception,
    set eval.inception_weights + eval.metric=inception, call evaluate()
    (ROADMAP backlog #1).  This pins that path end to end through the
    public API — random weights make the number meaningless, but the
    plumbing (resize to 299, feature/logit extraction, FID's singular-
    covariance regularization at tiny n, IS splits clamp) is the product."""
    from tpugan.configs import get_preset
    from tpugan.eval import evaluate
    from tpugan.models import build_models
    from tpugan.train import create_train_state

    path = str(tmp_path / "inception.pkl")
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)

    cfg = get_preset("dcgan_cifar10").override({
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "data.dataset": "synthetic", "data.synthetic_size": 16,
        "train.precision": "fp32",
        "eval.metric": "inception", "eval.inception_weights": path,
        "eval.fid_n": 4, "eval.fid_batch": 2})
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    real = np.random.default_rng(0).uniform(
        -1, 1, (6, 32, 32, 3)).astype(np.float32)
    scores = evaluate(cfg, g, state.params_g, state.state_g,
                      real_images=real)
    for k in ("fid", "kid", "is_mean"):
        assert np.isfinite(scores[k]), (k, scores)

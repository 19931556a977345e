"""FID/IS math checks + end-to-end eval on a tiny model."""

import numpy as np

from tpugan.configs import get_preset
from tpugan.eval import evaluate, fid_from_features, inception_score
from tpugan.eval.features import make_extractor
from tpugan.models import build_models
from tpugan.train import create_train_state


def test_fid_zero_for_identical_sets(rng):
    f = rng.standard_normal((500, 16)).astype(np.float64)
    assert abs(fid_from_features(f, f.copy())) < 1e-6


def test_fid_analytic_mean_shift(rng):
    """Same covariance, mean shifted by d: FID = ||d||^2."""
    f = rng.standard_normal((20000, 8))
    d = np.full(8, 0.5)
    got = fid_from_features(f, f + d)
    assert abs(got - 8 * 0.25) < 0.05


def test_fid_increases_with_distribution_distance(rng):
    base = rng.standard_normal((2000, 16))
    near = rng.standard_normal((2000, 16)) * 1.05
    far = rng.standard_normal((2000, 16)) * 3.0 + 2.0
    assert fid_from_features(base, near) < fid_from_features(base, far)


def test_inception_score_bounds(rng):
    # uniform probs -> IS == 1; one-hot varied classes -> IS == n_classes
    n, k = 1000, 10
    uniform = np.full((n, k), 1.0 / k)
    m, s = inception_score(uniform, splits=5)
    assert abs(m - 1.0) < 1e-5
    onehot = np.eye(k)[rng.integers(0, k, n)]
    m, _ = inception_score(onehot, splits=5)
    assert m > k * 0.9


def test_extractor_deterministic(rng):
    ex1 = make_extractor(3, "proxy")
    ex2 = make_extractor(3, "proxy")
    x = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    f1, p1 = ex1(x)
    f2, p2 = ex2(x)
    np.testing.assert_array_equal(f1, f2)
    from tpugan.eval.features import _PROXY_CLASSES
    assert f1.shape == (8, 256) and p1.shape == (8, _PROXY_CLASSES)
    np.testing.assert_allclose(p1.sum(1), 1.0, rtol=1e-4)


def test_inception_score_small_n_no_nan():
    """n < splits used to array_split into empty parts -> NaN metrics
    (observed as RuntimeWarnings from the sharded-eval tests)."""
    probs = np.full((3, 10), 0.1)
    with np.errstate(all="raise"):  # empty-slice mean would raise here
        m, s = inception_score(probs, splits=10)
    assert np.isfinite(m) and np.isfinite(s)
    assert abs(m - 1.0) < 1e-5  # uniform probs: IS == 1 at any n


def test_proxy_is_ranks_diversity():
    """The proxy head is TRAINED on seeded labeled synthetic data (an
    untrained head's softmax ranks nothing): it must classify held-out
    synthetic images well above chance, and proxy-IS must rank a diverse
    real set far above a single-class (collapsed) one."""
    from tpugan.data.datasets import make_synthetic
    from tpugan.eval.features import _PROXY_CLASSES

    ex = make_extractor(3, "proxy")
    d = make_synthetic(64, 3, 512, seed=123, n_classes=_PROXY_CLASSES)
    x = d["images"].astype(np.float32) / 127.5 - 1.0
    _, probs = ex(x)
    acc = float((probs.argmax(1) == d["labels"]).mean())
    assert acc > 0.8, f"held-out accuracy {acc} (chance {1/_PROXY_CLASSES})"
    is_diverse, _ = inception_score(probs)
    is_collapsed, _ = inception_score(probs[d["labels"] == 0])
    assert is_diverse > 3.0 * is_collapsed, (is_diverse, is_collapsed)


def test_inception_backend_is_weight_gated():
    try:
        make_extractor(3, "inception")
        raised = False
    except FileNotFoundError:
        raised = True
    assert raised


def test_end_to_end_evaluate():
    cfg = get_preset("dcgan_cifar10").override({
        "data.dataset": "synthetic", "data.synthetic_size": 256,
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "train.precision": "fp32", "eval.fid_n": 128, "eval.fid_batch": 64,
    })
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    r = evaluate(cfg, g, state.params_g, state.state_g, seed=0)
    assert np.isfinite(r["fid"]) and r["fid"] > 0  # untrained G: far from real
    assert r["is_mean"] >= 1.0 - 1e-6  # IS lower bound, fp tolerance
    # determinism of the whole eval
    r2 = evaluate(cfg, g, state.params_g, state.state_g, seed=0)
    assert r["fid"] == r2["fid"]


def test_real_feature_cache_hit_for_passed_images(rng, monkeypatch):
    """In-training eval passes real_images= every call; the second call must
    reuse cached real features instead of re-extracting 10k of them."""
    import importlib

    ev = importlib.import_module("tpugan.eval.evaluate")

    cfg = get_preset("dcgan_cifar10").override({
        "data.dataset": "synthetic", "data.synthetic_size": 256,
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "train.precision": "fp32", "eval.fid_n": 64, "eval.fid_batch": 64,
    })
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    reals = rng.integers(0, 256, (64, 32, 32, 3)).astype(np.uint8)

    calls = []
    orig = ev.make_extractor

    def counting_make_extractor(*a, **kw):
        ex = orig(*a, **kw)

        def wrapped(x, batch=64):
            calls.append(len(x))
            return ex(x, batch=batch)

        return wrapped

    monkeypatch.setattr(ev, "make_extractor", counting_make_extractor)
    ev._REAL_FEAT_CACHE.clear()
    r1 = ev.evaluate(cfg, g, state.params_g, state.state_g, seed=0,
                     real_images=reals)
    n_first = len(calls)  # fake + real extraction
    r2 = ev.evaluate(cfg, g, state.params_g, state.state_g, seed=0,
                     real_images=reals)
    assert len(calls) == n_first + 1  # second call: fake extraction only
    assert r1["fid"] == r2["fid"]


def test_real_feature_cache_isolates_differing_configs():
    """Two configs that share a dataset NAME but differ in channels (and
    hence in proxy extractor) must not share cached real features — a
    collision silently compares embeddings from two different random
    networks (same 256-dim shape, garbage FID)."""
    import importlib

    ev = importlib.import_module("tpugan.eval.evaluate")
    ev._REAL_FEAT_CACHE.clear()

    def run(channels):
        cfg = get_preset("dcgan_cifar10").override({
            "data.dataset": "synthetic", "data.synthetic_size": 128,
            "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
            "model.channels": channels,
            "train.precision": "fp32", "eval.fid_n": 64,
            "eval.fid_batch": 64,
        })
        g, d = build_models(cfg.model, cfg.train.precision)
        state = create_train_state(cfg, g, d)
        return ev.evaluate(cfg, g, state.params_g, state.state_g, seed=0)

    r3 = run(3)
    r1 = run(1)
    assert np.isfinite(r3["fid"]) and np.isfinite(r1["fid"])
    # the two (dataset, ...) keys must coexist — no silent sharing
    assert len(ev._REAL_FEAT_CACHE) == 2


def test_kid_near_zero_same_distribution(rng):
    from tpugan.eval.fid import kid_from_features
    a = rng.standard_normal((800, 16))
    b = rng.standard_normal((800, 16))
    kid, _ = kid_from_features(a, b, subset_size=400, n_subsets=5)
    assert abs(kid) < 0.05  # unbiased: hovers near 0 for matched dists


def test_kid_increases_with_distance(rng):
    from tpugan.eval.fid import kid_from_features
    base = rng.standard_normal((600, 16))
    near = rng.standard_normal((600, 16)) * 1.05
    far = rng.standard_normal((600, 16)) * 2.0 + 1.5
    k_near, _ = kid_from_features(base, near, subset_size=300, n_subsets=5)
    k_far, _ = kid_from_features(base, far, subset_size=300, n_subsets=5)
    assert k_near < k_far


def test_evaluate_folders_semantics(tmp_path):
    """Two-folder FID (the pytorch-fid workflow): ~0 for identical folders,
    same-distribution split << different-distribution, channels=1 path,
    limit honored, empty folder fails loudly."""
    import os

    import pytest

    from tpugan.data.datasets import make_synthetic
    from tpugan.eval import evaluate_folders
    from tpugan.utils import save_png

    imgs = make_synthetic(32, 3, 64, seed=0)["images"]  # uint8 NHWC
    def write(name, arr):
        d = str(tmp_path / name)
        os.makedirs(d)
        for i, im in enumerate(arr):
            save_png(os.path.join(d, f"{i:04d}.png"), im)
        return d

    a = write("a", imgs[:32])
    a2 = write("a2", imgs[32:])          # same distribution, disjoint split
    inv = write("inv", 255 - imgs[:32])  # different distribution

    same = evaluate_folders(a, a, image_size=32)
    assert same["fid"] < 1e-6 and same["n_a"] == 32
    split = evaluate_folders(a, a2, image_size=32)
    diff = evaluate_folders(a, inv, image_size=32)
    assert split["fid"] < diff["fid"]
    assert "is_mean" not in split

    capped = evaluate_folders(a, a2, image_size=32, n=8)
    assert capped["n_a"] == 8 and capped["n_b"] == 8
    gray = evaluate_folders(a, a2, image_size=32, channels=1)
    assert np.isfinite(gray["fid"])
    prdc = evaluate_folders(a, a2, image_size=32, prdc=True)
    assert {"precision", "recall"} <= set(prdc)

    os.makedirs(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError, match="no images"):
        evaluate_folders(a, str(tmp_path / "empty"), image_size=32)

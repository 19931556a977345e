"""Sampler determinism + dataset/pipeline behaviour."""

import numpy as np

from tpugan.configs import get_preset
from tpugan.data import load_dataset, make_input_pipeline
from tpugan.data.datasets import make_synthetic
from tpugan.models import build_models
from tpugan.sample import Sampler
from tpugan.train import create_train_state


def tiny(name="dcgan_mnist"):
    cfg = get_preset(name)
    return cfg.override({
        "data.dataset": "synthetic", "data.batch_size": 8,
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "train.precision": "fp32",
    })


def test_sampler_seed_determinism_and_chunking():
    cfg = tiny()
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    s = Sampler(cfg, g, state.params_g, state.state_g)
    a = s.sample(8, seed=7)
    b = s.sample(8, seed=7)
    np.testing.assert_array_equal(a, b)
    # chunked generation must produce the same images
    c = s.sample(8, seed=7, batch_size=4)
    np.testing.assert_array_equal(a, c)
    # different seed -> different images
    assert not np.array_equal(a, s.sample(8, seed=8))
    assert a.shape == (8, 28, 28, 1) and a.dtype == np.float32


def test_sampler_unroll_invariance():
    """unroll>1 (fused multi-batch programs, the dispatch-amortization
    path) must not change a single pixel vs sequential generation —
    including the non-divisible tail and the conditional variant."""
    cfg = tiny()
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    s = Sampler(cfg, g, state.params_g, state.state_g)
    a = s.sample(10, seed=7, batch_size=2)
    b = s.sample(10, seed=7, batch_size=2, unroll=3)  # 3 fused groups + tail
    np.testing.assert_array_equal(a, b)

    cfg_c = tiny("cdcgan_celeba64").override({
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8})
    gc, dc = build_models(cfg_c.model, cfg_c.train.precision)
    st = create_train_state(cfg_c, gc, dc)
    sc = Sampler(cfg_c, gc, st.params_g, st.state_g)
    lbl = np.arange(8, dtype=np.int32) % cfg_c.model.n_classes
    ac = sc.sample(8, seed=3, labels=lbl, batch_size=2)
    bc = sc.sample(8, seed=3, labels=lbl, batch_size=2, unroll=2)
    np.testing.assert_array_equal(ac, bc)

    # restricted paths fall back with a warning, not silently diverge
    import warnings as _w

    cfg_sp = tiny().override({"train.spatial_shards": 2})
    gs, ds = build_models(cfg_sp.model, cfg_sp.train.precision)
    sts = create_train_state(cfg_sp, gs, ds)
    ss = Sampler(cfg_sp, gs, sts.params_g, sts.state_g)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = ss.sample(4, seed=1, batch_size=2, unroll=2)
    assert out.shape == (4, 28, 28, 1)
    assert any("unroll" in str(r.message) for r in rec)


def test_conditional_sampler_labels():
    cfg = tiny("cdcgan_celeba64").override({
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8})
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    s = Sampler(cfg, g, state.params_g, state.state_g)
    lbl = np.zeros(4, np.int32)
    a = s.sample(4, seed=1, labels=lbl)
    b = s.sample(4, seed=1, labels=np.ones(4, np.int32))
    assert a.shape == (4, 64, 64, 3)
    assert not np.array_equal(a, b), "labels must condition the output"


def test_synthetic_dataset_deterministic():
    a = make_synthetic(16, 3, 10, seed=3, n_classes=4)
    b = make_synthetic(16, 3, 10, seed=3, n_classes=4)
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["labels"], b["labels"])
    assert a["images"].dtype == np.uint8
    assert a["images"].shape == (10, 16, 16, 3)
    assert not np.array_equal(
        a["images"], make_synthetic(16, 3, 10, seed=4)["images"])


def test_pipeline_shuffles_and_is_deterministic():
    data = make_synthetic(8, 1, 32, seed=0)
    p1 = make_input_pipeline(data, 8, seed=5)
    p2 = make_input_pipeline(data, 8, seed=5)
    it1, it2 = iter(p1), iter(p2)
    for _ in range(6):  # crosses an epoch boundary (4 steps/epoch)
        b1, b2 = next(it1), next(it2)
        np.testing.assert_array_equal(np.asarray(b1["image"]),
                                      np.asarray(b2["image"]))
    assert np.asarray(b1["image"]).dtype == np.uint8


def test_pipeline_start_step_fast_forwards_the_stream():
    """A pipeline built with start_step=s yields exactly the batches an
    uninterrupted stream yields from step s on — including across the
    epoch boundary — so a resumed host-pipeline run sees the data an
    uninterrupted run would have seen (bit-exact-resume contract)."""
    data = make_synthetic(8, 1, 32, seed=0)
    straight = iter(make_input_pipeline(data, 8, seed=5))
    skipped = [next(straight) for _ in range(6)]  # 4 steps/epoch: crosses one
    resumed = iter(make_input_pipeline(data, 8, seed=5, start_step=6))
    for _ in range(3):
        cont = next(straight)
        res = next(resumed)
        np.testing.assert_array_equal(np.asarray(cont["image"]),
                                      np.asarray(res["image"]))
    # sanity: the resumed stream did NOT replay the skipped batches
    assert not np.array_equal(np.asarray(skipped[0]["image"]),
                              np.asarray(res["image"]))


def test_missing_real_dataset_raises(tmp_path):
    try:
        load_dataset("mnist", str(tmp_path), image_size=28, channels=1)
        raised = False
    except FileNotFoundError:
        raised = True
    assert raised


def test_latent_interpolation():
    cfg = tiny()
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    s = Sampler(cfg, g, state.params_g, state.state_g)
    seq = s.interpolate(1, 2, steps=5)
    assert seq.shape == (5, 28, 28, 1)
    # endpoints equal direct generation from those latents
    a = s.sample(1, seed=1)
    np.testing.assert_allclose(seq[0], a[0], atol=1e-5)
    # path is not constant
    assert not np.allclose(seq[0], seq[-1])


def test_slerp_and_truncation():
    cfg = tiny()
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    s = Sampler(cfg, g, state.params_g, state.state_g)
    seq = s.interpolate(1, 2, steps=5, spherical=True)
    assert seq.shape == (5, 28, 28, 1)
    np.testing.assert_allclose(seq[0], s.sample(1, seed=1)[0], atol=1e-4)
    tr = s.sample_truncated(6, seed=3, threshold=0.5)
    assert tr.shape == (6, 28, 28, 1)
    # determinism
    np.testing.assert_array_equal(tr, s.sample_truncated(6, seed=3,
                                                         threshold=0.5))

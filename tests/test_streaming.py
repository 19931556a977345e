"""Streaming input path for larger-than-RAM folder datasets (SURVEY §1 L1
DataLoader semantics): per-batch threaded decode, bounded host memory,
same numbers as the eager loader."""

import os

import numpy as np
import pytest

from tpugan.data import load_dataset
from tpugan.data.datasets import StreamingImageFolder
from tpugan.data.pipeline import make_input_pipeline


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    """A tiny on-disk CelebA-style folder (PNG, odd aspect to exercise the
    center crop) + attribute file."""
    from PIL import Image

    root = tmp_path_factory.mktemp("celeba") / "img_align_celeba"
    os.makedirs(root)
    rng = np.random.default_rng(0)
    n = 24
    for i in range(n):
        a = rng.integers(0, 256, size=(20, 16, 3)).astype(np.uint8)
        Image.fromarray(a).save(root / f"{i:06d}.png")
    attrs = root.parent / "list_attr_celeba.txt"
    with open(attrs, "w") as f:
        f.write(f"{n}\nMale\n")
        for i in range(n):
            f.write(f"{i:06d}.png {1 if i % 2 else -1}\n")
    return str(root.parent)


def test_streaming_matches_eager(image_folder):
    eager = load_dataset("celeba", image_folder, image_size=16, channels=3,
                         streaming="off")
    stream = load_dataset("celeba", image_folder, image_size=16, channels=3,
                          streaming="on")
    s = stream["images"]
    assert isinstance(s, StreamingImageFolder)
    assert len(s) == len(eager["images"]) == 24
    np.testing.assert_array_equal(s.gather([0, 5, 23]),
                                  eager["images"][[0, 5, 23]])
    np.testing.assert_array_equal(s[:4], eager["images"][:4])
    np.testing.assert_array_equal(s[7], eager["images"][7])
    np.testing.assert_array_equal(stream["labels"], eager["labels"])


def test_auto_streams_over_budget(image_folder):
    # 24 × 16×16×3 = 18 KB decoded; force streaming with a 0-MB budget
    d = load_dataset("celeba", image_folder, image_size=16, channels=3,
                     streaming="auto", max_ram_mb=0)
    assert isinstance(d["images"], StreamingImageFolder)
    d2 = load_dataset("celeba", image_folder, image_size=16, channels=3,
                      streaming="auto", max_ram_mb=4096)
    assert isinstance(d2["images"], np.ndarray)


def test_pipeline_streams_lazily_and_matches(image_folder):
    """The input pipeline over the streaming dataset yields exactly the
    eager pipeline's batches, decoding only what each batch needs."""
    eager = load_dataset("celeba", image_folder, image_size=16, channels=3,
                         streaming="off")
    stream = load_dataset("celeba", image_folder, image_size=16, channels=3,
                          streaming="on")
    s = stream["images"]
    assert s.decoded_count == 0  # nothing decoded at load time

    it_e = iter(make_input_pipeline(eager, 8, seed=3))
    it_s = iter(make_input_pipeline(stream, 8, seed=3, prefetch=1))
    for _ in range(3):
        be, bs = next(it_e), next(it_s)
        np.testing.assert_array_equal(np.asarray(bs["image"]),
                                      np.asarray(be["image"]))
        np.testing.assert_array_equal(np.asarray(bs["label"]),
                                      np.asarray(be["label"]))
    # bounded: decoded ≈ batches pulled (+ prefetch), never the full epoch
    # repeated into memory — and the object never holds a dataset buffer.
    assert s.decoded_count <= 8 * (3 + 2)
    assert not any(isinstance(v, np.ndarray) and v.nbytes > 8 * 16 * 16 * 3
                   for v in vars(s).values())


def test_trainer_streams_end_to_end(image_folder, tmp_path):
    import dataclasses

    from tpugan.configs import get_preset
    from tpugan.train import Trainer

    cfg = get_preset("dcgan_celeba64").override({
        "model.image_size": 32, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "data.batch_size": 8, "data.hflip": False,
        "data.streaming": "on", "train.precision": "fp32",
        "train.total_steps": 2, "train.log_every": 1,
        "train.sample_every": 0, "train.ckpt_every": 0,
    })
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, data_dir=image_folder),
        train=dataclasses.replace(cfg.train, ckpt_dir=str(tmp_path / "c"),
                                  out_dir=str(tmp_path / "o")))
    m = Trainer(cfg).train()
    assert np.isfinite(m["loss_d"]) and np.isfinite(m["loss_g"])


def test_device_resident_rejects_streaming(image_folder, tmp_path):
    import dataclasses

    from tpugan.configs import get_preset
    from tpugan.train import Trainer

    cfg = get_preset("dcgan_celeba64").override({
        "model.image_size": 32, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "data.batch_size": 8, "data.streaming": "on",
        "data.device_resident": True, "train.precision": "fp32",
        "train.total_steps": 1,
    })
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, data_dir=image_folder),
        train=dataclasses.replace(cfg.train, ckpt_dir=str(tmp_path / "c"),
                                  out_dir=str(tmp_path / "o")))
    with pytest.raises(ValueError, match="streaming"):
        Trainer(cfg).train()


def test_eval_decodes_once_on_streaming(image_folder):
    """evaluate() on a StreamingImageFolder keys its real-feature cache on
    dataset identity BEFORE decoding: the first eval decodes fid_n images,
    every later eval (keep_best / eval_every ticks) decodes zero."""
    import dataclasses

    import jax

    from tpugan.configs import get_preset
    from tpugan.eval import evaluate
    from tpugan.eval.evaluate import _REAL_FEAT_CACHE
    from tpugan.models import build_models

    cfg = get_preset("dcgan_celeba64").override({
        "model.image_size": 32, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32"})
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, fid_n=8, fid_batch=8))
    g, _ = build_models(cfg.model, cfg.train.precision)
    params_g, state_g = g.init(jax.random.PRNGKey(0))

    stream = load_dataset("celeba", image_folder, image_size=16, channels=3,
                          streaming="on")
    s = stream["images"]
    _REAL_FEAT_CACHE.clear()
    assert s.decoded_count == 0

    r1 = evaluate(cfg, g, params_g, state_g, seed=0, real_images=s)
    first = s.decoded_count
    assert first == 8  # exactly the fid_n slice, once

    r2 = evaluate(cfg, g, params_g, state_g, seed=0, real_images=s)
    r3 = evaluate(cfg, g, params_g, state_g, seed=1, real_images=s)
    assert s.decoded_count == first, "repeat eval re-decoded the real set"
    assert r1["fid"] == r2["fid"]
    assert np.isfinite(r3["fid"])

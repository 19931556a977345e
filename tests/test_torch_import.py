"""torch -> tpugan checkpoint import (the trained-model migration path).

VERDICT r3 #3: the parity harness could only transplant jax -> torch; a
gan-playground user's main asset is a trained .pth.  These tests prove the
inverse maps are exact at every architecture variant:

- double inversion: torch-random-init twin -> import -> transplant back
  into a fresh twin reproduces the original state_dict bit-exactly
  (weights, BN running stats, SN u buffers);
- forward parity: the imported generator/discriminator match the twin's
  eval forward to float precision;
- the CLI round-trip produces a restorable checkpoint whose Sampler output
  matches the twin.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tpugan.ckpt.torch_import import (
    import_torch_state,
    split_reference_checkpoint,
)
from tpugan.configs import get_preset
from tpugan.models import build_models


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _cfg(preset, **over):
    base = {"model.ngf": 16, "model.ndf": 16, "model.nz": 16,
            "data.dataset": "synthetic", "data.batch_size": 8,
            "train.precision": "fp32"}
    base.update(over)
    return get_preset(preset).override(base)


def _twins(cfg, seed=0):
    from tpugan.parity.torch_twin import (
        TorchCondDiscriminator,
        TorchCondGenerator,
        TorchDiscriminator,
        TorchGenerator,
    )

    torch.manual_seed(seed)
    m = cfg.model
    if m.arch == "cdcgan":
        tg = TorchCondGenerator(m.image_size, m.channels, m.nz, m.ngf,
                                m.n_classes, m.embed_dim,
                                batchnorm=m.g_batchnorm)
        td = TorchCondDiscriminator(m.image_size, m.channels, m.ndf,
                                    m.n_classes, m.embed_dim,
                                    batchnorm=m.d_batchnorm)
    else:
        tg = TorchGenerator(m.image_size, m.channels, m.nz, m.ngf,
                            batchnorm=m.g_batchnorm)
        td = TorchDiscriminator(m.image_size, m.channels, m.ndf,
                                batchnorm=m.d_batchnorm,
                                spectral_norm=m.d_spectral_norm)
    # perturb BN running stats away from their init so the import of the
    # RUNNING statistics (not just weights) is actually exercised
    with torch.no_grad():
        for mod in list(tg.modules()) + list(td.modules()):
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0.1, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
    return tg, td


# the five reference architecture variants (SURVEY §0 configs):
# 1-channel MNIST (no BN in D), CIFAR DCGAN (BN in D), WGAN-GP (no BN in
# D), SNGAN (spectral norm), conditional CelebA
PRESETS = ["dcgan_mnist", "dcgan_cifar10", "wgan_gp_cifar10",
           "sngan_cifar10", "cdcgan_celeba64"]


@pytest.mark.parametrize("preset", PRESETS)
def test_import_double_inversion_bit_exact(preset):
    """import (torch->jax) then transplant (jax->torch) reproduces the
    original state_dict exactly — storage layout maps are true inverses."""
    from tpugan.parity.runners import build_torch_twins

    cfg = _cfg(preset)
    tg, td = _twins(cfg)
    state = import_torch_state(cfg, tg.state_dict(), td.state_dict())
    tg2, td2 = build_torch_twins(cfg, state)
    for orig, back in ((tg, tg2), (td, td2)):
        sd_o, sd_b = orig.state_dict(), back.state_dict()
        assert set(sd_o) == set(sd_b)
        for k in sd_o:
            if k.endswith("num_batches_tracked"):
                continue
            np.testing.assert_array_equal(
                sd_o[k].numpy(), sd_b[k].numpy(), err_msg=f"{preset}:{k}")


@pytest.mark.parametrize("preset", PRESETS)
def test_imported_forward_matches_twin(preset, rng):
    """The imported G and D compute what the twin computes (eval mode,
    float precision) — semantics, not just storage."""
    cfg = _cfg(preset)
    tg, td = _twins(cfg)
    state = import_torch_state(cfg, tg.state_dict(), td.state_dict())
    g, d = build_models(cfg.model, cfg.train.precision)
    tg.eval(), td.eval()

    m = cfg.model
    z = rng.standard_normal((8, m.nz)).astype(np.float32)
    x = rng.standard_normal(
        (8, m.image_size, m.image_size, m.channels)).astype(np.float32)
    if m.arch == "cdcgan":
        y = rng.integers(0, m.n_classes, 8).astype(np.int32)
        ours_g, _ = g.apply(state.params_g, state.state_g,
                            (jnp.asarray(z), jnp.asarray(y)), train=False)
        ours_d, _ = d.apply(state.params_d, state.state_d,
                            (jnp.asarray(x), jnp.asarray(y)), train=False)
        with torch.no_grad():
            theirs_g = tg(torch.from_numpy(z), torch.from_numpy(y)
                          ).numpy().transpose(0, 2, 3, 1)
            theirs_d = td(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(y)).numpy()
    else:
        ours_g, _ = g.apply(state.params_g, state.state_g, jnp.asarray(z),
                            train=False)
        ours_d, _ = d.apply(state.params_d, state.state_d, jnp.asarray(x),
                            train=False)
        with torch.no_grad():
            theirs_g = tg(torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)
            theirs_d = td(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours_g), theirs_g,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_d), theirs_d,
                               rtol=1e-4, atol=2e-4)


def test_split_reference_checkpoint_variants():
    g_sd = {"head.weight": torch.zeros(2, 2)}
    d_sd = {"features.0.weight": torch.zeros(2, 2, 4, 4)}
    # dict-of-everything (the reference's torch.save contract)
    g, d, step = split_reference_checkpoint(
        {"G": g_sd, "D": d_sd, "step": 1200, "epoch": 3})
    assert g is g_sd and d is d_sd and step == 1200
    # alternate key spellings
    g, d, _ = split_reference_checkpoint({"netG": g_sd, "netD": d_sd})
    assert g is g_sd and d is d_sd
    # bare state_dicts classify by their distinctive keys
    g, d, _ = split_reference_checkpoint(dict(g_sd))
    assert g is not None and d is None
    g, d, _ = split_reference_checkpoint(dict(d_sd))
    assert g is None and d is not None
    # DataParallel prefix handled inside import (not split) — split of
    # garbage fails loudly
    with pytest.raises(ValueError, match="could not locate"):
        split_reference_checkpoint({"foo": 1})


def test_import_rejects_architecture_mismatch():
    """Leftover torch keys (wrong preset for the weights) fail loudly."""
    cfg = _cfg("dcgan_cifar10")
    tg, _ = _twins(cfg)
    wrong = _cfg("dcgan_cifar10", **{"model.ngf": 8})  # narrower G
    with pytest.raises((ValueError, KeyError)):
        import_torch_state(wrong, g_sd=tg.state_dict())


def test_import_torch_cli_round_trip(tmp_path, rng):
    """torch.save -> `tpugan import-torch` -> restorable checkpoint whose
    Sampler matches the twin's eval forward."""
    from tpugan.cli import main as cli_main
    from tpugan.sample import Sampler

    cfg = _cfg("dcgan_cifar10")
    tg, td = _twins(cfg)
    pth = tmp_path / "ref.pth"
    torch.save({"G": tg.state_dict(), "D": td.state_dict(), "step": 777},
               str(pth))
    out = str(tmp_path / "ckpt")
    cli_main(["import-torch", "dcgan_cifar10",
              "--set", "model.ngf=16", "--set", "model.ndf=16",
              "--set", "model.nz=16", "--set", "train.precision=fp32",
              "--ckpt", str(pth), "--out", out])

    # restore through the standard path and compare generator outputs
    from tpugan.ckpt import CheckpointManager
    from tpugan.models import build_models
    from tpugan.train import TrainState, create_train_state

    g, d = build_models(cfg.model, cfg.train.precision)
    template = create_train_state(cfg, g, d)
    state = TrainState(**CheckpointManager(out).restore(dict(template)))
    assert int(state.step) == 777
    sampler = Sampler(cfg, g, state.params_g, state.state_g)
    z = np.asarray(sampler.noise(8, seed=3))
    ours = sampler.sample_fixed(jnp.asarray(z))
    tg.eval()
    with torch.no_grad():
        theirs = tg(torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("preset", ["dcgan_cifar10", "sngan_cifar10"])
def test_trained_twin_imports_exactly(preset):
    """Migration of an actually-TRAINED reference model (the demo's claim,
    benchmarks/migrate_torch_demo.py): after real torch training steps the
    BN running stats and SN u buffers are the loop's, not an init's — the
    imported generator must still be indistinguishable from the twin."""
    from tpugan.parity.runners import (
        build_torch_twins,
        compare_final_generators,
        make_streams,
        parity_cfg,
        run_torch,
    )
    from tpugan.train import create_train_state

    cfg = parity_cfg(get_preset(preset), batch_size=16, width=16, nz=16)
    g, d = build_models(cfg.model, cfg.train.precision)
    state0 = create_train_state(cfg, g, d)
    tg, td = build_torch_twins(cfg, state0)
    streams, real = make_streams(cfg, 12, seed=5)
    run_torch(cfg, tg, td, streams)

    # training must have moved the buffers the import claims to carry —
    # G's BN running stats, and for the SN discriminator the u vectors —
    # otherwise this test is the same as the init-time one
    moved = [k for k, v in tg.state_dict().items()
             if k.endswith("running_mean")
             and float(v.abs().max()) > 1e-6]
    assert moved, "torch training left every BN running_mean at zero"
    if cfg.model.d_spectral_norm:
        u = [k for k in td.state_dict() if k.endswith(".u")]
        assert u, "SN discriminator has no power-iteration u buffers"

    state = import_torch_state(cfg, tg.state_dict(), td.state_dict(),
                               step=12)
    cmp = compare_final_generators(cfg, g, state, tg, real, n=128)
    assert cmp["fid_cross"] < 1e-8, cmp
    assert cmp["rel_delta"] < 1e-4, cmp
    assert cmp["pixel_mae"] < 1e-5, cmp

    # the discriminator side of the migration (trained weights + buffers,
    # incl. the power-iteration u the SN variant's sigma depends on)
    td.eval()
    rng = np.random.default_rng(3)
    x = real[rng.integers(0, len(real), 16)]
    ours_d, _ = d.apply(state.params_d, state.state_d, jnp.asarray(x),
                        train=False)
    with torch.no_grad():
        theirs_d = td(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours_d), theirs_d,
                               rtol=1e-4, atol=2e-4)

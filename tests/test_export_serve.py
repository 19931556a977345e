"""Deployment path: jax.export artifacts + the micro-batching HTTP server.

The exported artifact must reproduce the live Sampler's pixels per seed
(the determinism contract survives export), accept any batch size via the
symbolic batch dimension, and serve concurrent requests coalesced into
padded device batches.
"""

import http.client
import io
import json
import threading
import time

import numpy as np
import pytest

from tpugan.configs import get_preset
from tpugan.export import export_generator, load_generator, save_generator
from tpugan.models import build_models
from tpugan.sample import Sampler
from tpugan.serve import BatchingEngine, make_server
from tpugan.train import create_train_state

TINY = {"model.ngf": 8, "model.ndf": 8, "model.nz": 16,
        "train.precision": "fp32"}


def _tiny_gen(preset="dcgan_mnist", extra=()):
    cfg = get_preset(preset).override({**TINY, **dict(extra)})
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    return cfg, g, state


@pytest.fixture(scope="module")
def unconditional():
    cfg, g, state = _tiny_gen()
    blob = export_generator(cfg, g, state.params_g, state.state_g,
                            platforms=("cpu",))
    return cfg, g, state, load_generator(blob)


def test_export_roundtrip_matches_live_sampler(unconditional):
    cfg, g, state, exported = unconditional
    live = Sampler(cfg, g, state.params_g, state.state_g)
    a = live.sample(6, seed=3)
    b = exported.sample(6, seed=3)
    # same math, but the export lowering (symbolic batch) fuses differently
    # than the live jit — agreement is to float precision, not bit-exact
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-8)


def test_symbolic_batch_any_size(unconditional):
    cfg, _, _, exported = unconditional
    for n in (1, 3, 8):
        imgs = exported.sample(n, seed=0)
        assert imgs.shape == (n, cfg.model.image_size, cfg.model.image_size,
                              cfg.model.channels)
    # chunked generation is identical to one-shot (per-index noise contract)
    np.testing.assert_array_equal(exported.sample(8, seed=0),
                                  exported.sample(8, seed=0, batch_size=3))


def test_fixed_batch_export_pads_tail():
    cfg, g, state = _tiny_gen()
    blob = export_generator(cfg, g, state.params_g, state.state_g,
                            batch=4, platforms=("cpu",))
    exported = load_generator(blob)
    ref = load_generator(export_generator(
        cfg, g, state.params_g, state.state_g, platforms=("cpu",)))
    np.testing.assert_allclose(exported.sample(6, seed=1),
                               ref.sample(6, seed=1), rtol=1e-4, atol=1e-8)


def test_conditional_export():
    cfg, g, state = _tiny_gen("cdcgan_celeba128",
                              (("model.image_size", 32),))
    blob = export_generator(cfg, g, state.params_g, state.state_g,
                            platforms=("cpu",))
    exported = load_generator(blob)
    live = Sampler(cfg, g, state.params_g, state.state_g)
    np.testing.assert_allclose(live.sample(5, seed=7),
                               exported.sample(5, seed=7),
                               rtol=1e-4, atol=1e-8)
    with pytest.raises(ValueError):
        exported.generate(np.zeros((2, cfg.model.nz), np.float32))


def test_save_and_load_file(tmp_path, unconditional):
    cfg, g, state, _ = unconditional
    path = str(tmp_path / "gen.tpugan")
    save_generator(path, cfg, g, state.params_g, state.state_g,
                   platforms=("cpu",))
    exported = load_generator(path)
    assert exported.nz == cfg.model.nz
    assert exported.meta["config"]["model"]["image_size"] == \
        cfg.model.image_size
    assert exported.sample(2, seed=0).shape[0] == 2


def test_batching_engine_coalesces_and_is_correct(unconditional):
    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=32, linger_ms=20.0)
    try:
        futs = [engine.sample(2, seed=s) for s in range(6)]
        outs = [f.result(timeout=120) for f in futs]
        for s, out in enumerate(outs):
            np.testing.assert_allclose(out, exported.sample(2, seed=s),
                                       rtol=1e-4, atol=1e-8)
        # the 20ms linger window must have coalesced at least some requests
        assert engine.stats["batches"] < engine.stats["requests"]
        assert engine.stats["images"] == 12
    finally:
        engine.close()


def test_batching_engine_error_propagates(unconditional):
    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=8, linger_ms=1.0)
    try:
        # malformed requests are rejected synchronously at submit()
        with pytest.raises(ValueError):
            engine.submit(np.zeros((2, exported.nz + 1), np.float32))
        # a backend failure inside the worker fails only that batch and
        # the worker survives
        orig = engine.gen.generate
        engine.gen.generate = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("device fell over"))
        bad = engine.sample(1, seed=0)
        with pytest.raises(RuntimeError):
            bad.result(timeout=120)
        engine.gen.generate = orig
        ok = engine.sample(1, seed=0).result(timeout=120)
        assert ok.shape[0] == 1
    finally:
        engine.close()


@pytest.fixture()
def server(unconditional):
    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=16, linger_ms=1.0)
    srv = make_server(engine, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], exported
    srv.shutdown()
    srv.server_close()
    engine.close()


def _post(port, path, obj):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(obj),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), body


def test_http_healthz(server):
    port, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    obj = json.loads(resp.read())
    conn.close()
    assert resp.status == 200 and obj["ok"]
    assert obj["model"]["nz"] == 16


def test_http_sample_npy_deterministic(server):
    port, exported = server
    status, ctype, body = _post(port, "/sample",
                                {"n": 3, "seed": 11, "format": "npy"})
    assert status == 200 and ctype == "application/octet-stream"
    imgs = np.load(io.BytesIO(body))
    np.testing.assert_allclose(imgs, exported.sample(3, seed=11),
                               rtol=1e-4, atol=1e-8)


def test_http_sample_png_and_errors(server):
    port, _ = server
    status, ctype, body = _post(port, "/sample", {"n": 4, "seed": 0})
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    status, _, body = _post(port, "/sample", {"n": 0})
    assert status == 400 and b"error" in body
    status, _, body = _post(port, "/sample", {"n": 1, "format": "bmp"})
    assert status == 400


def test_sharded_sampler_matches_single_device():
    """Multi-chip inference: replicated weights + batch-sharded latents on
    the 8-device mesh produce the single-device Sampler's pixels, for
    mesh-divisible and ragged n alike; and it plugs into BatchingEngine."""
    from tpugan.parallel import ShardedSampler, make_mesh

    cfg, g, state = _tiny_gen()
    mesh = make_mesh(8)
    sharded = ShardedSampler(cfg, g, state.params_g, state.state_g, mesh)
    live = Sampler(cfg, g, state.params_g, state.state_g)
    for n in (16, 5):  # divisible and ragged
        np.testing.assert_allclose(sharded.sample(n, seed=2),
                                   live.sample(n, seed=2),
                                   rtol=1e-4, atol=1e-8)
    engine = BatchingEngine(sharded, max_batch=32, linger_ms=10.0)
    try:
        futs = [engine.sample(3, seed=s) for s in range(4)]
        for s, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=120),
                                       live.sample(3, seed=s),
                                       rtol=1e-4, atol=1e-8)
    finally:
        engine.close()


def test_sharded_sampler_conditional():
    from tpugan.parallel import ShardedSampler, make_mesh

    cfg, g, state = _tiny_gen("cdcgan_celeba128",
                              (("model.image_size", 32),))
    sharded = ShardedSampler(cfg, g, state.params_g, state.state_g,
                             make_mesh(8))
    live = Sampler(cfg, g, state.params_g, state.state_g)
    np.testing.assert_allclose(sharded.sample(10, seed=5),
                               live.sample(10, seed=5),
                               rtol=1e-4, atol=1e-8)


def test_fixed_batch_artifact_serves_through_engine():
    """Review finding: engine batches must work against fixed-batch
    artifacts (generate() chunks/pads internally)."""
    cfg, g, state = _tiny_gen()
    fixed = load_generator(export_generator(
        cfg, g, state.params_g, state.state_g, batch=4, platforms=("cpu",)))
    ref = load_generator(export_generator(
        cfg, g, state.params_g, state.state_g, platforms=("cpu",)))
    # direct generate with non-multiple sizes
    z = np.asarray(ref.sample(7, seed=0))  # any (7, nz) latents via contract
    from tpugan.sample.sampler import seeded_noise
    z = np.asarray(seeded_noise(cfg.model.nz, 7, 3))
    np.testing.assert_allclose(fixed.generate(z), ref.generate(z),
                               rtol=1e-4, atol=1e-8)
    # sample with an explicit batch_size != fixed_batch
    np.testing.assert_allclose(fixed.sample(8, seed=1, batch_size=3),
                               ref.sample(8, seed=1),
                               rtol=1e-4, atol=1e-8)
    engine = BatchingEngine(fixed, max_batch=8, linger_ms=5.0)
    try:
        futs = [engine.sample(3, seed=s) for s in range(3)]
        for s, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=120),
                                       ref.sample(3, seed=s),
                                       rtol=1e-4, atol=1e-8)
    finally:
        engine.close()


def test_engine_validates_at_submit_and_respects_max_batch(unconditional):
    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=4, linger_ms=5.0)
    try:
        # malformed latents rejected synchronously, never enqueued
        with pytest.raises(ValueError):
            engine.submit(np.zeros((2, exported.nz + 1), np.float32))
        with pytest.raises(ValueError):
            engine.submit(np.zeros((2, exported.nz), np.float32),
                          np.zeros((2,), np.int32))  # labels on uncond
        # oversized request: split into <=max_batch chunks, reassembled
        out = engine.sample(10, seed=3).result(timeout=120)
        np.testing.assert_allclose(out, exported.sample(10, seed=3),
                                   rtol=1e-4, atol=1e-8)
        # no single device batch exceeded max_batch (padded to pow2 of <=4)
        assert engine.stats["batches"] >= 3
        assert engine.stats["images"] == 10
    finally:
        engine.close()


def test_engine_pads_to_pow2_buckets(unconditional):
    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=16, linger_ms=1.0)
    try:
        engine.sample(3, seed=0).result(timeout=120)  # 3 -> bucket 4
        engine.sample(5, seed=0).result(timeout=120)  # 5 -> bucket 8
        assert engine.stats["padded_images"] == (4 - 3) + (8 - 5)
    finally:
        engine.close()


def test_http_label_length_and_format_rejected_before_generation(server):
    port, _ = server
    status, _, body = _post(port, "/sample",
                            {"n": 2, "labels": [1], "format": "npy"})
    assert status == 400 and b"labels" in body  # rejected pre-generation
    status, _, body = _post(port, "/sample", {"n": 1, "format": "bmp"})
    assert status == 400 and b"unknown format" in body


def test_http_metrics_endpoint(server):
    port, _ = server
    _post(port, "/sample", {"n": 2, "format": "npy"})
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    text = resp.read().decode()
    conn.close()
    assert resp.status == 200
    assert "tpugan_images" in text and "tpugan_batches" in text
    assert "tpugan_batch_latency_p50_ms" in text


@pytest.mark.slow
def test_engine_soak_concurrent_load(unconditional):
    """200 concurrent mixed-size requests from 16 threads: every response
    correct (per-seed contract), no deadlock, stats consistent."""
    from concurrent.futures import ThreadPoolExecutor

    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=32, linger_ms=2.0)
    expect = {s: exported.sample(1 + s % 7, seed=s) for s in range(20)}
    try:
        def one(i):
            s = i % 20
            out = engine.sample(1 + s % 7, seed=s).result(timeout=300)
            np.testing.assert_allclose(out, expect[s], rtol=1e-4, atol=1e-8)
            return out.shape[0]
        with ThreadPoolExecutor(max_workers=16) as pool:
            sizes = list(pool.map(one, range(200)))
        assert engine.stats["images"] == sum(sizes)
        assert engine.stats["requests"] == 200
        assert engine.latency_summary()["p50_ms"] > 0
    finally:
        engine.close()


def test_exported_call_composes_under_jit(unconditional):
    """Exported.call is traceable: compose it inside a larger jitted
    program (the bulk-generation / benchmarking pattern)."""
    import jax
    import jax.numpy as jnp

    _, _, _, exported = unconditional

    @jax.jit
    def checksum(z):
        return jnp.sum(exported._exported.call(z))

    z = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, exported.nz)).astype(np.float32))
    direct = float(np.sum(exported.generate(z)))
    composed = float(checksum(z))
    np.testing.assert_allclose(composed, direct, rtol=1e-4)


def test_engine_backpressure_sheds_overload(unconditional):
    """Bounded queue: when pending requests hit queue_depth, submit() raises
    EngineOverloadedError fast instead of queueing unboundedly (HTTP 503)."""
    import time as _time

    from tpugan.serve import EngineOverloadedError

    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=4, linger_ms=1.0,
                            queue_depth=3)
    try:
        # stall the device path so the queue backs up deterministically
        orig = engine.gen.generate
        release = threading.Event()

        def slow_generate(*a, **k):
            release.wait(timeout=30)
            return orig(*a, **k)

        engine.gen.generate = slow_generate
        futs = [engine.sample(1, seed=s) for s in range(3)]  # 1 in worker +
        # queue_depth more may be admitted; overflow must reject quickly
        t0 = _time.monotonic()
        with pytest.raises(EngineOverloadedError):
            for s in range(3, 20):
                futs.append(engine.sample(1, seed=s))
        assert _time.monotonic() - t0 < 5.0, "rejection was not fast"
        release.set()
        for f in futs:  # everything admitted still completes
            assert f.result(timeout=60).shape[0] == 1
    finally:
        release.set()
        engine.gen.generate = orig
        engine.close()


def test_engine_close_fails_pending_futures(unconditional):
    """Requests still queued (or parked in _carry) at close() error out fast
    with 'engine closed' instead of blocking until the request timeout."""
    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=2, linger_ms=1.0,
                            queue_depth=64)
    orig = engine.gen.generate
    release = threading.Event()

    def slow_generate(*a, **k):
        release.wait(timeout=30)
        return orig(*a, **k)

    engine.gen.generate = slow_generate
    futs = [engine.sample(1, seed=s) for s in range(8)]
    # initiate close() while the worker is still blocked inside its FIRST
    # batch, then release it: the worker finishes that batch, sees _stop,
    # and exits — the queued remainder must be drain-failed, never
    # processed (deterministic: no race on how fast the worker drains)
    closer = threading.Thread(target=engine.close)
    closer.start()
    time.sleep(0.3)
    release.set()
    closer.join(timeout=60)
    assert not closer.is_alive()
    resolved = 0
    for f in futs:
        try:
            f.result(timeout=5)
            resolved += 1
        except RuntimeError as e:
            assert "engine closed" in str(e)
    # the worker processed at most its in-flight batch (+ a carried item);
    # everything else failed fast (not timed out), and none is pending
    assert all(f.done() for f in futs)
    assert resolved <= 3
    assert resolved < len(futs)


def test_http_request_size_cap_scales_with_image_size(server):
    """The n cap is a response-BYTE budget, not a flat count: a request
    whose npy response would exceed MAX_RESPONSE_MB is a 400 at parse
    time (concurrent multi-GB responses OOMed the serving host before),
    and the error names the actual cap."""
    from tpugan.serve.server import MAX_RESPONSE_MB

    port, exported = server
    s, c = exported.image_size, exported.channels
    cap = min(4096, max(1, MAX_RESPONSE_MB * (1 << 20) // (s * s * c * 4)))
    status, _, body = _post(port, "/sample", {"n": cap + 1})
    assert status == 400 and b"out of range" in body


def test_engine_requests_stat_counts_clients_not_chunks(unconditional):
    """One oversized client request splits into ceil(n/max_batch) device
    chunks; stats['requests'] must count 1, not the chunk count."""
    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=4, linger_ms=1.0)
    try:
        before = engine.stats["requests"]
        imgs = engine.sample(10, seed=0).result(timeout=120)  # 3 chunks
        assert imgs.shape[0] == 10
        assert engine.stats["requests"] == before + 1
    finally:
        engine.close()


def test_http_validation_nrow_and_labels(server):
    """Request validation happens BEFORE device work: bad nrow and bad
    labels are 400s with JSON bodies, never 500s/dropped connections."""
    port, _ = server
    status, ctype, body = _post(port, "/sample", {"n": 4, "nrow": 0})
    assert status == 400 and b"nrow" in body
    status, _, body = _post(port, "/sample", {"n": 2, "labels": [0, 1]})
    assert status == 400 and b"labels" in body  # unconditional model
    status, _, body = _post(port, "/sample",
                            {"n": 2, "labels": ["x", "y"]})
    assert status == 400


@pytest.mark.slow  # 23s: FSDP Trainer compile; single-device export and
# the cross-topology restore fallback stay default.
def test_export_from_fsdp_trained_checkpoint(tmp_path):
    """The full scaling-user journey: train under FSDP, checkpoint, export
    a deployable artifact from the checkpoint dir, sample from it — the
    sharded training placement must not leak into deployment."""
    import dataclasses

    from tpugan.ckpt import CheckpointManager
    from tpugan.train import Trainer

    cfg = get_preset("dcgan_mnist").override({
        **TINY, "data.dataset": "synthetic", "data.batch_size": 16,
        "data.synthetic_size": 32, "train.total_steps": 2,
        "train.log_every": 10, "train.sample_every": 0,
        "train.ckpt_every": 2, "train.mesh_shape": 4,
        "train.fsdp_shards": 2})
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out")))
    t = Trainer(cfg)
    t.train()

    # export path reads the checkpoint without any mesh context
    from tpugan.cli import _load_generator_from_ckpt

    cfg2, g, params, state_g, step = _load_generator_from_ckpt(
        str(tmp_path / "ckpt"))
    assert step == 2
    blob = export_generator(cfg2, g, params, state_g, platforms=("cpu",))
    exported = load_generator(blob)
    imgs = exported.sample(4, seed=1)
    assert imgs.shape[0] == 4 and np.isfinite(imgs).all()


def test_engine_shed_drops_timed_out_request(unconditional):
    """ADVICE r3: a caller that times out sheds its queued work via
    engine.shed() (the HTTP 504 path): every chunk future fails, and the
    worker never runs the abandoned device work — client retries shed load
    instead of adding it."""
    _, _, _, exported = unconditional
    engine = BatchingEngine(exported, max_batch=2, linger_ms=1.0,
                            queue_depth=64)
    orig = engine.gen.generate
    release = threading.Event()
    calls = []

    def slow_generate(z, y=None):
        calls.append(z.shape[0])
        release.wait(timeout=30)
        return orig(z, y)

    engine.gen.generate = slow_generate
    try:
        blocker = engine.sample(1, seed=0)  # occupies the worker
        time.sleep(0.3)
        # oversized request -> 2 chunks of max_batch, both still queued
        abandoned = engine.sample(4, seed=1)
        engine.shed(abandoned)  # what the HTTP handler does on timeout
        with pytest.raises(TimeoutError):
            abandoned.result(timeout=5)
        release.set()
        assert blocker.result(timeout=60).shape[0] == 1
        after = engine.sample(1, seed=2)
        assert after.result(timeout=60).shape[0] == 1
        # the worker ran the blocker and the follow-up, never the shed
        # request's chunks
        assert sum(calls) == 2, calls
    finally:
        release.set()
        engine.gen.generate = orig
        engine.close()

"""Real 2-process jax.distributed execution on CPU (SURVEY §2b distributed
row): two OS processes bootstrap through initialize_multihost with a
localhost coordinator, form one global mesh, and run a psum whose result
proves cross-process reduction.  Skipped if the sandbox forbids sockets."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugan.parallel.multihost import initialize_multihost, local_batch_slice

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
idx = initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
assert idx == pid, (idx, pid)
assert jax.process_count() == nproc, jax.process_count()

devs = jax.devices()  # global device list across both processes
assert len(devs) == nproc * 2, devs  # 2 local CPU devices per process
mesh = Mesh(np.array(devs), ("data",))

# global array: each process contributes its local shard; psum over the
# mesh must see BOTH processes' values.
global_batch = nproc * 2
sl = local_batch_slice(global_batch)
assert sl == slice(pid * 2, pid * 2 + 2), sl
vals = np.arange(global_batch, dtype=np.float32)  # 0..3, sum = 6

local = vals[sl]
arrs = [jax.device_put(local[i:i+1], d) for i, d in enumerate(jax.local_devices())]
garr = jax.make_array_from_single_device_arrays(
    (global_batch,), NamedSharding(mesh, P("data")), arrs)

@jax.jit
def total(x):
    return jnp.sum(x)

out = jax.jit(total, out_shardings=NamedSharding(mesh, P()))(garr)
got = float(out.addressable_shards[0].data[()])  # replicated result
assert got == float(vals.sum()), (got, vals.sum())
print(f"WORKER{pid}_OK", flush=True)
"""


def test_two_process_distributed_psum(tmp_path):
    # pick a free localhost port; skip if sockets are unavailable
    try:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    except OSError:
        pytest.skip("sandbox forbids sockets")

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        assert f"WORKER{pid}_OK" in out, out[-2000:]


_TRAIN_WORKER = r"""
import os, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.parallel.multihost import initialize_multihost, local_batch_slice
from tpugan.train import build_train_step, create_train_state

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
devs = jax.devices()
assert len(devs) == nproc * 4, devs  # 4 local CPU devices per process
mesh = Mesh(np.array(devs), ("data",))

# the REAL training step — WGAN-GP (double backward) — sharded over a mesh
# that spans two OS processes; per-process state is identical by seeded
# construction, so replicated placement is single-program semantics.
cfg = get_preset("wgan_gp_cifar10").override({
    "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
    "data.batch_size": len(devs), "train.precision": "fp32",
    "train.donate": False})
g, d = build_models(cfg.model, cfg.train.precision)
state = create_train_state(cfg, g, d)
state = jax.device_put(state, NamedSharding(mesh, P()))
step = build_train_step(cfg, g, d)

# global uint8 batch: every process holds the full seeded array and
# contributes its local rows
rng = np.random.default_rng(0)
imgs = rng.integers(0, 256, size=(len(devs), 32, 32, 3)).astype(np.uint8)
sl = local_batch_slice(len(devs))
local = imgs[sl]
arrs = [jax.device_put(local[i:i + 1], dd)
        for i, dd in enumerate(jax.local_devices())]
garr = jax.make_array_from_single_device_arrays(
    imgs.shape, NamedSharding(mesh, P("data")), arrs)

state, metrics = step(state, {"image": garr})
for k, v in metrics.items():
    val = float(np.asarray(v.addressable_shards[0].data))
    assert np.isfinite(val), (k, val)
assert int(np.asarray(state.step.addressable_shards[0].data)) == 1
loss_d = float(np.asarray(metrics["loss_d"].addressable_shards[0].data))
print(f"TRAIN{pid}_OK loss_d={loss_d:.6f}", flush=True)
"""


@pytest.mark.slow  # 132s: full WGAN-GP step over 2 OS processes; the
# 2-proc psum test keeps the multihost path gated in the default tier
def test_two_process_distributed_train_step(tmp_path):
    """The full WGAN-GP train step (gradient penalty double backward,
    cross-replica BN, both optimizer updates) executes over a mesh spanning
    two OS processes; both report identical replicated losses."""
    try:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    except OSError:
        pytest.skip("sandbox forbids sockets")

    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed train workers timed out")
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"TRAIN{pid}_OK")]
        assert line, out[-2000:]
        losses.append(float(line[0].split("loss_d=")[1]))
    assert losses[0] == losses[1], losses  # replicated result agrees


_TRAINER_WORKER = r"""
import os, sys
import numpy as np
import jax

from tpugan.configs import get_preset
from tpugan.parallel import make_mesh
from tpugan.parallel.multihost import initialize_multihost

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
workdir = sys.argv[4]
initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
devs = jax.devices()
assert len(devs) == nproc * 4, devs

from tpugan.train import Trainer  # noqa: E402  (after distributed init)

def make_cfg(total_steps, resume=""):
    import dataclasses
    cfg = get_preset("dcgan_cifar10").override({
        "data.dataset": "synthetic", "data.batch_size": 16,
        "data.synthetic_size": 64, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32",
        "train.total_steps": total_steps, "train.log_every": 10,
        "train.sample_every": 0, "train.ckpt_every": 10,
        "train.donate": False})
    return dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=workdir + "/ckpt", out_dir=workdir + f"/out{pid}",
        resume=resume))

mesh = make_mesh()  # all 8 global devices
t = Trainer(make_cfg(20), mesh=mesh)
m = t.train()
assert int(t.state.step) == 20
print(f"PHASE1_{pid} loss_d={m['loss_d']:.6f}", flush=True)

# resume across processes from the shared checkpoint
t2 = Trainer(make_cfg(24, resume=workdir + "/ckpt"), mesh=mesh)
m2 = t2.train()
assert int(t2.state.step) == 24
print(f"PHASE2_{pid} loss_d={m2['loss_d']:.6f}", flush=True)
"""


@pytest.mark.slow  # 95s on the 1-core box; the 2-proc psum + train-step
# tests stay in the default tier, so cross-process coverage is retained
def test_two_process_trainer_end_to_end(tmp_path):
    """VERDICT r2 #3: Trainer(cfg).train() itself runs multi-host — the
    input pipeline feeds per-process local shards stitched into global
    arrays, both processes train 20 steps with identical replicated losses,
    and the run resumes from the shared checkpoint."""
    try:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    except OSError:
        pytest.skip("sandbox forbids sockets")

    worker = tmp_path / "trainer_worker.py"
    worker.write_text(_TRAINER_WORKER)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port),
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("trainer workers timed out")
    phase = {1: [], 2: []}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        for ph in (1, 2):
            line = [ln for ln in out.splitlines()
                    if ln.startswith(f"PHASE{ph}_{pid}")]
            assert line, (ph, out[-2000:])
            phase[ph].append(float(line[0].split("loss_d=")[1]))
    assert phase[1][0] == phase[1][1], phase  # replicated losses agree
    assert phase[2][0] == phase[2][1], phase
    # only process 0 wrote metric files
    assert (tmp_path / "out0" / "metrics.jsonl").exists()
    assert not (tmp_path / "out1" / "metrics.jsonl").exists()


_FSDP_TRAINER_WORKER = r"""
import os, sys
import numpy as np
import jax

from tpugan.configs import get_preset
from tpugan.parallel.multihost import initialize_multihost

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
workdir = sys.argv[4]
initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
devs = jax.devices()
assert len(devs) == nproc * 4, devs

from tpugan.train import Trainer  # noqa: E402  (after distributed init)

def make_cfg(total_steps, resume=""):
    import dataclasses
    cfg = get_preset("dcgan_cifar10").override({
        "data.dataset": "synthetic", "data.batch_size": 16,
        "data.synthetic_size": 64, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32",
        "train.total_steps": total_steps, "train.log_every": 10,
        "train.sample_every": 0, "train.ckpt_every": 10,
        "train.mesh_shape": 4, "train.fsdp_shards": 2,
        "train.donate": False})
    return dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=workdir + "/ckpt", out_dir=workdir + f"/out{pid}",
        resume=resume))

t = Trainer(make_cfg(20))  # builds its own (data=4, model=2) global mesh
assert tuple(t.mesh.axis_names) == ("data", "model"), t.mesh
w = t.state.params_g["block0"]["conv"]["w"]
shard_shapes = {tuple(s.data.shape) for s in w.addressable_shards}
assert all(s[-1] == w.shape[-1] // 2 for s in shard_shapes), shard_shapes
m = t.train()
assert int(t.state.step) == 20
print(f"PHASE1_{pid} loss_d={m['loss_d']:.6f}", flush=True)

# resume across processes from the shared checkpoint, back into the
# model-sharded placement
t2 = Trainer(make_cfg(24, resume=workdir + "/ckpt"))
m2 = t2.train()
assert int(t2.state.step) == 24
w2 = t2.state.params_g["block0"]["conv"]["w"]
assert {tuple(s.data.shape) for s in w2.addressable_shards} == shard_shapes
print(f"PHASE2_{pid} loss_d={m2['loss_d']:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_trainer_fsdp(tmp_path):
    """Composition matrix (VERDICT r3 #4): multihost x FSDP — the Trainer
    builds the global (data=4, model=2) mesh across 2 OS processes, weights
    shard over 'model' spanning hosts, losses replicate identically, and
    the run resumes from the shared checkpoint into the sharded
    placement."""
    try:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    except OSError:
        pytest.skip("sandbox forbids sockets")

    worker = tmp_path / "fsdp_trainer_worker.py"
    worker.write_text(_FSDP_TRAINER_WORKER)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port),
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            # two workers time-slicing one core, each compiling two Trainer
            # programs over a 4-device mesh: generous on a 1-CPU box
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("fsdp trainer workers timed out")
    phase = {1: [], 2: []}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        for ph in (1, 2):
            line = [ln for ln in out.splitlines()
                    if ln.startswith(f"PHASE{ph}_{pid}")]
            assert line, (ph, out[-2000:])
            phase[ph].append(float(line[0].split("loss_d=")[1]))
    assert phase[1][0] == phase[1][1], phase  # replicated losses agree
    assert phase[2][0] == phase[2][1], phase


def test_initialize_multihost_unit_paths(monkeypatch):
    """Every bootstrap branch of initialize_multihost, executed in-process:
    single-process no-op, explicit coordinator args (forwarded verbatim),
    and the TPU-pod autodetect path (a BARE jax.distributed.initialize() —
    topology from the metadata service, no args).  The real 2-process tests
    above cover the explicit path end-to-end; this pins the no-op and
    autodetect branches that a 1-chip box can never reach for real."""
    import jax

    from tpugan.parallel.multihost import initialize_multihost

    calls = []

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.append((coordinator_address, num_processes, process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setattr(jax, "process_index", lambda: 3)

    # single-process no-op: returns 0 WITHOUT touching jax.distributed
    assert initialize_multihost() == 0
    assert initialize_multihost(num_processes=1) == 0
    assert calls == []

    # explicit coordinator: args forwarded verbatim, index from the runtime
    assert initialize_multihost("10.0.0.1:9999", 4, 3) == 3
    assert calls == [("10.0.0.1:9999", 4, 3)]

    # TPU-pod autodetect: a bare initialize() — no args, metadata service
    calls.clear()
    assert initialize_multihost(autodetect=True) == 3
    assert calls == [(None, None, None)]

    # half-specified cluster: a lone process_id must fail loudly — a
    # silent single-process fallback would train every host independently
    calls.clear()
    with pytest.raises(ValueError, match="without"):
        initialize_multihost(process_id=3)
    assert calls == []

"""Mesh helpers: multihost init error surfacing + batch placement."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from ppvision_tpu.parallel import mesh as pmesh


def test_initialize_multihost_explicit_args_failure_raises(monkeypatch):
    """A typo'd coordinator must NOT silently degrade to single-process
    (VERDICT r2 weak #8)."""

    def boom(**kw):
        raise RuntimeError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="multi-host init failed.*bad-host:1234"):
        pmesh.initialize_multihost(
            coordinator_address="bad-host:1234", num_processes=2, process_id=0
        )


def test_initialize_multihost_no_args_failure_is_noop(monkeypatch):
    def boom(**kw):
        raise RuntimeError("no cluster autodetected")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    pmesh.initialize_multihost()  # must not raise


_MULTIHOST_WORKER = """
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ppvision_tpu.parallel import mesh as pmesh

coord, pid = sys.argv[1], int(sys.argv[2])
pmesh.initialize_multihost(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert (pid == 0) == pmesh.is_primary()
mesh = pmesh.make_mesh()  # global mesh spanning both processes
n = mesh.shape["data"]
assert n == len(jax.devices()) >= 2
# Each process contributes its own local shard of a GLOBAL batch.
local = np.full((4 // 2, 3), float(pid + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, global_shape=(4, 3)
)
total = jax.jit(
    lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
)(arr)
print("SUM", float(total), flush=True)  # 2*3*1 + 2*3*2 = 18
"""


@pytest.mark.slow
def test_initialize_multihost_two_processes_end_to_end(tmp_path):
    """REAL multi-host: two CPU processes join over a local coordinator
    (the DCN path), build one global mesh, and reduce a
    process-sharded global array.  Proves initialize_multihost beyond
    the mocked error-path tests above."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_MULTIHOST_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # 1 CPU device per process
    # CPU-only workers: keep any TPU-tunnel sitecustomize (e.g. the
    # axon relay's site dir) out of the subprocess — its registration
    # dials hardware at interpreter start and can hang the worker.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "SUM 18.0" in out, out


def test_shard_batch_placement():
    mesh = pmesh.make_mesh(8)
    batch = {
        "x": np.zeros((16, 4, 4, 3), np.float32),  # divisible -> sharded
        "y": np.zeros((3,), np.float32),  # not divisible -> replicated
        "s": np.float32(1.0),  # scalar -> replicated
    }
    placed = pmesh.shard_batch(mesh, batch)
    assert placed["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert placed["y"].sharding.spec in (
        jax.sharding.PartitionSpec(), jax.sharding.PartitionSpec(None)
    )
    np.testing.assert_array_equal(np.asarray(placed["x"]), batch["x"])


_TRAINSTEP_WORKER = """
import sys
import numpy as np
import jax
import jax.numpy as jnp

from ppvision_tpu.parallel import mesh as pmesh

coord, pid, ckpt_root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
pmesh.initialize_multihost(coord, 2, pid)
assert jax.process_count() == 2

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, LossConfig, ModelConfig
from ppvision_tpu.optics.camera import CameraSpec, init_camera_params, make_camera_constants
from ppvision_tpu.train.gan import FrozenNets, init_gan, make_train_step
from ppvision_tpu.utils.checkpoint import StepCheckpoints

IMG = 32
cfg = FaceDeIdConfig(
    model=ModelConfig(img_size=IMG, fan_input_size=64, max_conv_dim=32,
                      style_dim=8, compute_dtype="float32"),
    camera=CameraConfig(n=IMG, zernike_terms=16),
    loss=LossConfig(lambda_heatmap=0.0),
)
models, fan, state = init_gan(jax.random.key(0), cfg)  # same on both ranks
spec = CameraSpec(n=IMG, zernike_terms=16)
fan_params = fan.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))["params"]
frozen = FrozenNets(
    camera_params=init_camera_params(jax.random.key(2), spec),
    camera_consts=make_camera_constants(spec),
    fan_params=fan_params,
    fan_priv_params=fan_params,
)
step = make_train_step(models, fan, cfg)

b = 4  # GLOBAL batch
rng = np.random.default_rng(3)
batch = dict(
    x_src=rng.random((b, IMG, IMG, 3), np.float32),
    y_src=np.zeros((b,), np.int32),
    x_ref=rng.random((b, IMG, IMG, 3), np.float32),
    x_ref2=rng.random((b, IMG, IMG, 3), np.float32),
    y_ref=np.ones((b,), np.int32),
    z_trg=rng.standard_normal((b, 16)).astype(np.float32),
    z_trg2=rng.standard_normal((b, 16)).astype(np.float32),
)

# Single-process reference on THIS rank's one local device, full batch.
ref_state, ref_metrics = step(state, frozen, batch)

# Distributed: each rank materializes only its contiguous block; the
# global batch is reassembled by shard_batch.
mesh = pmesh.make_mesh()
assert mesh.shape["data"] == 2
sl = pmesh.process_slice(b)
local = {k: (v[sl] if v.ndim >= 1 and v.shape[0] == b else v) for k, v in batch.items()}
assert local["x_src"].shape[0] == pmesh.local_batch_size(b) == 2
sharded = pmesh.shard_batch(mesh, local)
state_g = pmesh.replicate_pytree(mesh, state)
frozen_g = pmesh.replicate_pytree(mesh, frozen)
with mesh:
    new_state, metrics = step(state_g, frozen_g, sharded)
    jax.block_until_ready(new_state.params["generator"])

# Metric equality vs the single-process step (f32; reduction-order
# noise only -> tight band, same as the 8-virtual-device test).
for k in ref_metrics:
    a, r = float(metrics[k]), float(ref_metrics[k])
    assert abs(a - r) <= max(1e-3 * abs(r), 2e-4), (k, a, r)
# Updated params match: Adam first-step bound (see test_train_gan).
for net in ("generator", "mapping_network", "style_encoder", "discriminator"):
    lr = 1e-6 if net == "mapping_network" else 1e-4
    diff = np.concatenate([
        np.abs(np.asarray(x) - np.asarray(y)).ravel()
        for x, y in zip(jax.tree_util.tree_leaves(ref_state.params[net]),
                        jax.tree_util.tree_leaves(new_state.params[net]))
    ])
    assert diff.max() < 10 * lr, (net, float(diff.max()))
    assert diff.mean() < lr / 5, (net, float(diff.mean()))

# Rank-0-gated checkpointing, exactly as cli/main.py::run_train.
if pmesh.is_primary():
    ckpts = StepCheckpoints(ckpt_root)
    ckpts.save(1, "nets", new_state.params)
print("PRIMARY", pmesh.is_primary(), "STEP_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_gan_train_step(tmp_path):
    """REAL multi-host training: two processes (1 CPU device each) run
    ONE full GAN train step over a 2-device global mesh with
    process-local batch construction, and the result matches the
    single-process step on the same global batch; exactly one process
    writes the checkpoint (VERDICT r3 item 1)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    ckpt_root = str(tmp_path / "ckpts")
    worker = tmp_path / "worker.py"
    worker.write_text(_TRAINSTEP_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # 1 CPU device per process
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid), ckpt_root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert "PRIMARY True STEP_OK" in outs[0], outs[0]
    assert "PRIMARY False STEP_OK" in outs[1], outs[1]
    # Exactly one checkpoint, written by the primary alone.
    assert sorted(os.listdir(ckpt_root)) == ["000001_nets"], os.listdir(ckpt_root)


_CAPTION_WORKER = """
import sys
import numpy as np
import jax
import jax.numpy as jnp

from ppvision_tpu.parallel import mesh as pmesh

coord, pid, ckpt_root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
pmesh.initialize_multihost(coord, 2, pid)
assert jax.process_count() == 2

from ppvision_tpu.config import CaptionConfig
from ppvision_tpu.data.caption import caption_batches
from ppvision_tpu.optics.lens import (
    LensSpec, init_lens_params, make_lens_constants,
)
from ppvision_tpu.train.caption import init_caption, make_caption_train_step
from ppvision_tpu.utils.checkpoint import StepCheckpoints

VOCAB, B, L, PATCH = 30, 4, 10, 32
cfg = CaptionConfig(
    emb_dim=16, attention_dim=16, decoder_dim=16, encoded_image_size=4,
    batch_size=B, dropout=0.0, camera_lr=1e-2,
)
spec = LensSpec(wave_res=64, patch_size=PATCH, zernike_terms=16)
consts = make_lens_constants(spec)
encoder, decoder, state0 = init_caption(
    jax.random.key(0), cfg, VOCAB, spec, init_lens_params(spec),
    encoder_stages=(1, 1, 1, 1),
)
step = make_caption_train_step(encoder, decoder, cfg, spec, consts)


class FakeDS:
    # Duck-typed CaptionDataset: len + (img, caption, caplen) items.
    split = "TRAIN"

    def __init__(self):
        rng = np.random.default_rng(5)
        self.imgs = rng.random((2 * B, PATCH, PATCH, 3), np.float32)
        self.caps = rng.integers(3, VOCAB, size=(2 * B, L)).astype(np.int32)
        self.lens = (L - rng.integers(0, 4, size=2 * B)).astype(np.int32)

    def __len__(self):
        return len(self.caps)

    def __getitem__(self, i):
        return self.imgs[i], self.caps[i], self.lens[i]


ds = FakeDS()

# Single-process reference walk on THIS rank's one local device: the
# full global batches (process_count=1 loader), per-step fixed rngs.
ref_state, ref_hist = state0, []
for it, batch in enumerate(caption_batches(ds, B, shuffle=True, seed=0)):
    ref_state, m = step(ref_state, batch, jax.random.key(100 + it))
    ref_hist.append({k: float(v) for k, v in m.items()})
assert len(ref_hist) == 2

# Distributed: the SAME epoch walk, each rank materializing only its
# contiguous block (exactly cli/caption.py::run_train's wiring).
mesh = pmesh.make_mesh(axis_names=("data",))
assert mesh.shape["data"] == 2
state = pmesh.replicate_pytree(mesh, state0)
hist = []
for it, local in enumerate(caption_batches(
    ds, B, shuffle=True, seed=0,
    process_index=jax.process_index(), process_count=jax.process_count(),
)):
    assert local["images"].shape[0] == pmesh.local_batch_size(B) == 2
    sharded = pmesh.shard_batch(
        mesh, local, local_batch=pmesh.local_batch_size(B)
    )
    with mesh:
        state, m = step(state, sharded, jax.random.key(100 + it))
    hist.append({k: float(v) for k, v in m.items()})

# Metric equality vs the single-process steps (f32 reduction noise only).
for it, (a, r) in enumerate(zip(hist, ref_hist)):
    for k in r:
        assert abs(a[k] - r[k]) <= max(1e-3 * abs(r[k]), 2e-4), (it, k, a[k], r[k])

# Updated params match the single-process trajectory after 2 steps.
for name, ours, ref in (
    ("camera", state.camera, ref_state.camera),
    ("encoder", state.encoder["params"], ref_state.encoder["params"]),
    ("decoder", state.decoder, ref_state.decoder),
):
    diff = np.concatenate([
        np.abs(np.asarray(x) - np.asarray(y)).ravel()
        for x, y in zip(jax.tree_util.tree_leaves(ours),
                        jax.tree_util.tree_leaves(ref))
    ])
    lr = dict(camera=1e-2, encoder=1e-4, decoder=5e-4)[name]
    assert diff.max() < 10 * lr, (name, float(diff.max()))

# Rank-0 eval path (cli/caption.py:176-185): pull host-local copies of
# the replicated global arrays and run a PLAIN LOCAL program on them.
if pmesh.is_primary():
    eval_state = jax.device_get(state)
    feats = jax.jit(
        lambda v, x: encoder.apply(v, x, train=False)
    )(eval_state.encoder, jnp.asarray(ds.imgs[:2]))
    assert np.isfinite(np.asarray(feats)).all()
    ckpts = StepCheckpoints(ckpt_root)
    ckpts.save(1, "caption_state", eval_state.decoder)
print("PRIMARY", pmesh.is_primary(), "CAPTION_STEP_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_caption_train_step(tmp_path):
    """REAL multi-host caption training (VERDICT r4 item 5): two
    processes run a full 2-step epoch with block-sliced
    ``caption_batches`` over a 2-device global mesh; metrics and params
    match the single-process walk at the same global batches, the
    rank-0 eval ``device_get`` path executes under process_count==2,
    and exactly one process writes the checkpoint."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    ckpt_root = str(tmp_path / "ckpts")
    worker = tmp_path / "worker.py"
    worker.write_text(_CAPTION_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # 1 CPU device per process
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid), ckpt_root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert "PRIMARY True CAPTION_STEP_OK" in outs[0], outs[0]
    assert "PRIMARY False CAPTION_STEP_OK" in outs[1], outs[1]
    # Exactly one checkpoint, written by the primary alone.
    assert sorted(os.listdir(ckpt_root)) == ["000001_caption_state"], (
        os.listdir(ckpt_root))

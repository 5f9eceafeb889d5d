"""DeIdServer batching/pipelining correctness (ppvision_tpu/serve.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppvision_tpu.config import CameraConfig, FaceDeIdConfig, ModelConfig
from ppvision_tpu.deid import build_deid, deid_multi_style
from ppvision_tpu.serve import DeIdServer


@pytest.fixture(scope="module")
def tiny():
    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=64, style_dim=16, latent_dim=8,
                          max_conv_dim=64, fan_input_size=64),
        camera=CameraConfig(n=32),
    )
    bundle = build_deid(jax.random.key(0), cfg)
    xr = np.asarray(jax.random.uniform(jax.random.key(2), (3, 64, 64, 3)))
    yr = np.zeros((3,), np.int32)
    return bundle, xr, yr


@pytest.mark.slow  # compiles the tiny de-id pipeline
def test_server_matches_direct_call_and_pads_tail(tiny):
    bundle, xr, yr = tiny
    rng = np.random.default_rng(0)
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(5)]

    server = DeIdServer(bundle, xr, yr, batch_size=2, depth=1)
    server.warmup()
    outs = list(server.serve(imgs))
    assert len(outs) == 5  # 2 + 2 + 1 (padded tail batch)
    assert all(o.shape == (3, 64, 64, 3) for o in outs)

    # Order + values must EXACTLY match the same compiled program run
    # directly (the server adds batching/pipelining, not arithmetic; an
    # eager reference would differ by jit-vs-eager bf16 fusion noise).
    fn = jax.jit(
        lambda p, xs: deid_multi_style(bundle, p, xs, jnp.asarray(xr), jnp.asarray(yr))
    )
    direct = np.asarray(fn(bundle.params, jnp.asarray(np.stack(imgs[:2]))))
    np.testing.assert_array_equal(outs[0], direct[:, 0])
    np.testing.assert_array_equal(outs[1], direct[:, 1])
    # The tail batch pads by replicating the last valid image (zero
    # padding would NaN-poison the whole batch through the camera's
    # 0/0 max-normalize + the generator's global skip-cache mean).
    tail = np.asarray(fn(
        bundle.params,
        jnp.asarray(np.stack([imgs[4], imgs[4]])),
    ))
    np.testing.assert_array_equal(outs[4], tail[:, 0])
    for o in outs:
        assert np.isfinite(o).all()


@pytest.mark.slow  # GSPMD compile of the tiny pipeline on 8 virtual devices
def test_sharded_server_matches_single_device():
    """DeIdServer(mesh=...) shards each batch over the data axis; f32
    compute is exactly shard-invariant (see test_deid_sharding)."""
    from ppvision_tpu.parallel.mesh import make_mesh

    cfg = FaceDeIdConfig(
        model=ModelConfig(img_size=64, style_dim=16, latent_dim=8,
                          max_conv_dim=64, fan_input_size=64,
                          compute_dtype="float32"),
        camera=CameraConfig(n=32),
    )
    bundle = build_deid(jax.random.key(0), cfg)
    xr = np.asarray(jax.random.uniform(jax.random.key(2), (2, 64, 64, 3)))
    yr = np.zeros((2,), np.int32)
    rng = np.random.default_rng(1)
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(9)]

    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = DeIdServer(bundle, xr, yr, batch_size=8, depth=2, mesh=mesh)
    single = DeIdServer(bundle, xr, yr, batch_size=8, depth=2)
    got = list(sharded.serve(imgs))
    want = list(single.serve(imgs))
    assert len(got) == len(want) == 9
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=0, atol=5e-4)

    with pytest.raises(ValueError):
        DeIdServer(bundle, xr, yr, batch_size=3, mesh=mesh)


@pytest.mark.slow
def test_server_rejects_bad_shapes_and_args(tiny):
    bundle, xr, yr = tiny
    with pytest.raises(ValueError):
        DeIdServer(bundle, xr, yr, batch_size=0)
    server = DeIdServer(bundle, xr, yr, batch_size=2)
    with pytest.raises(ValueError):
        list(server.serve([np.zeros((32, 32, 3), np.float32)]))


@pytest.mark.slow  # shares the tiny pipeline compile
def test_flush_deadline_serves_lone_request(tiny):
    """A streaming caller with a trickle of requests must not wait for
    batch_size-1 friends: with max_wait_s the oldest pending request is
    flushed as a padded partial batch (VERDICT r2 weak #6)."""
    import time

    bundle, xr, yr = tiny
    rng = np.random.default_rng(1)
    img0 = rng.random((64, 64, 3)).astype(np.float32)
    img1 = rng.random((64, 64, 3)).astype(np.float32)

    server = DeIdServer(bundle, xr, yr, batch_size=4, depth=1)
    server.warmup()

    import threading

    got_first = threading.Event()

    def trickle():
        yield img0
        # Producer releases the second image only AFTER the consumer
        # received the first output: if the deadline flush did not
        # work, out0 could only arrive after this 20 s timeout.
        released_early = not got_first.wait(timeout=20.0)
        assert not released_early, "consumer never received the lone request"
        yield img1

    t0 = time.monotonic()
    gen = server.serve(trickle(), max_wait_s=0.15)
    out0 = next(gen)
    got_first.set()
    t_first = time.monotonic() - t0
    assert out0.shape == (3, 64, 64, 3)
    assert t_first < 15.0, f"lone request took {t_first:.2f}s"

    # Value check: identical to the direct padded-batch program.
    fn = jax.jit(
        lambda p, xs: deid_multi_style(
            bundle, p, xs, jnp.asarray(xr), jnp.asarray(yr)
        )
    )
    batch = np.stack([img0] * 4)  # replicate-padding semantics
    direct = np.asarray(fn(bundle.params, jnp.asarray(batch)))
    np.testing.assert_array_equal(out0, direct[:, 0])
    assert np.isfinite(out0).all()

    # The rest of the stream still arrives, in order.
    out1 = next(gen)
    assert out1.shape == (3, 64, 64, 3)
    assert list(gen) == []


@pytest.mark.slow
def test_flush_deadline_full_batches_unaffected(tiny):
    """With a fast producer, max_wait_s never fires: outputs match the
    no-deadline path exactly."""
    bundle, xr, yr = tiny
    rng = np.random.default_rng(2)
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(5)]
    server = DeIdServer(bundle, xr, yr, batch_size=2, depth=1)
    server.warmup()
    plain = list(server.serve(imgs))
    timed = list(server.serve(imgs, max_wait_s=30.0))
    assert len(plain) == len(timed) == 5
    for a, b in zip(plain, timed):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_server_stats_latency_and_queue_depth(tiny):
    """Serving observability (VERDICT r4 item 7): per-request latency
    quantiles and queue-depth gauges must reflect the actual run."""
    bundle, xr, yr = tiny
    rng = np.random.default_rng(3)
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(5)]
    server = DeIdServer(bundle, xr, yr, batch_size=2, depth=1)
    server.warmup()

    s0 = server.stats()
    assert s0["completed"] == 0 and s0["latency_p50_s"] is None

    outs = list(server.serve(imgs))
    assert len(outs) == 5
    s = server.stats()
    assert s["completed"] == 5
    assert s["batches_dispatched"] == 3  # 2 + 2 + 1 (padded tail)
    # Latencies: one per completed request, positive, ordered quantiles.
    assert s["latency_p50_s"] > 0
    assert s["latency_p99_s"] >= s["latency_p50_s"]
    assert s["latency_max_s"] >= s["latency_p99_s"]
    # All work drained: queues empty; depth peaked at >= one full batch.
    assert s["pending"] == 0
    assert s["inflight_batches"] == 0
    assert s["max_queue_depth"] >= 2

    server.reset_stats()
    s2 = server.stats()
    assert s2["completed"] == 0 and s2["batches_dispatched"] == 0
    assert s2["latency_p50_s"] is None

    # The deadline path records stats the same way.
    _ = list(server.serve(imgs[:3], max_wait_s=30.0))
    s3 = server.stats()
    assert s3["completed"] == 3
    assert s3["batches_dispatched"] == 2
    assert s3["latency_p99_s"] >= s3["latency_p50_s"] > 0


@pytest.mark.slow  # compiles the tiny pipeline twice (f32 + u8 out)
def test_uint8_out_space_matches_host_conversion(tiny):
    """out_space='uint8' converts on device with the exact sample
    _to_uint8 math — byte-identical to converting the f32 output."""
    bundle, xr, yr = tiny
    rng = np.random.default_rng(3)
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(2)]

    f32_srv = DeIdServer(bundle, xr, yr, batch_size=2, depth=1)
    u8_srv = DeIdServer(bundle, xr, yr, batch_size=2, depth=1,
                        out_space="uint8")
    outs_f32 = list(f32_srv.serve(imgs))
    outs_u8 = list(u8_srv.serve(imgs))
    assert all(o.dtype == np.uint8 for o in outs_u8)
    for a, b in zip(outs_f32, outs_u8):
        want = np.clip(a * 255.0, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(b, want)

    with pytest.raises(ValueError):
        DeIdServer(bundle, xr, yr, out_space="float16")

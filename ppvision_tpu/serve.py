"""Batching inference server for the de-id pipeline.

Production-serving layer over ``deid.deid_multi_style``: callers submit
individual source images (any count), the server packs them into
fixed-shape device batches (one compiled program, no shape-driven
recompiles), keeps ``depth`` batches in flight to hide host<->device
latency behind device compute (dispatch on the axon/TPU runtime is
async — enqueueing batch t+1 while batch t executes costs nothing), and
returns per-request results in submission order.

The reference has no serving layer (its ``--mode sample`` is a one-shot
batch script, Face-DeId/core/utils.py:151-196); this is the
deployment-path component the TPU rewrite adds.  Design notes:

- **Static shapes**: the last batch is padded up to ``batch_size`` and
  the padding outputs dropped on the host.  One program, compiled once.
- **Pipelined dispatch**: results are jax.Arrays whose computation has
  only been *enqueued*; the server syncs (host-transfers) batch
  t-depth when dispatching batch t, so the device never idles waiting
  on the host and the host never queues unboundedly.
- **Styles fixed per server**: the reference styles/domains are an
  argument of the compiled program, mirroring the eval workload
  (metrics/eval.py:57-93).
"""

from __future__ import annotations

import time
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .deid import DeIdBundle, deid_multi_style

__all__ = ["DeIdServer"]


class DeIdServer:
    """Fixed-batch pipelined de-id inference.

    ``serve(images)`` maps an iterable of (H, W, 3) float arrays to a
    generator of (R, H, W, 3) anonymized outputs (one per source, R
    styles each), in order.
    """

    def __init__(
        self,
        bundle: DeIdBundle,
        x_ref: np.ndarray,
        y_ref: np.ndarray,
        batch_size: int = 128,
        depth: int = 4,
        mesh=None,
        out_space: str = "float32",
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — each batch's
        leading axis shards over the mesh's ``data`` axis (params and
        styles replicate), so one server drives a whole slice; GSPMD
        partitions the program and ``batch_size`` must divide the mesh
        size.  Instance/AdaIN norms are per-sample, so the sharded
        program is the single-device math (tests/test_deid_sharding.py).

        ``out_space``: "float32" yields raw pipeline outputs; "uint8"
        converts to saved-image space ON DEVICE with the exact
        ``sample._to_uint8`` math (clip(x*255, 0, 255)) — 4x fewer
        result bytes over the device->host link, bit-identical to
        converting the float output on the host (tests/test_serve.py).
        """
        if batch_size < 1 or depth < 1:
            raise ValueError("batch_size and depth must be >= 1")
        if out_space not in ("float32", "uint8"):
            raise ValueError(f"out_space must be float32|uint8, got {out_space}")
        if mesh is not None and batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {batch_size} must divide over the mesh's "
                f"data axis ({mesh.shape['data']})"
            )
        self._bundle = bundle
        self._batch = batch_size
        self._depth = depth
        self._mesh = mesh
        if mesh is not None:
            from .parallel.mesh import batch_sharding, replicate

            self._x_ref = jax.device_put(jnp.asarray(x_ref), replicate(mesh))
            self._y_ref = jax.device_put(
                jnp.asarray(y_ref, dtype=jnp.int32), replicate(mesh)
            )
            self._params = jax.device_put(bundle.params, replicate(mesh))
            self._in_shard = batch_sharding(mesh)
        else:
            self._x_ref = jnp.asarray(x_ref)
            self._y_ref = jnp.asarray(y_ref, dtype=jnp.int32)
            self._params = bundle.params
            self._in_shard = None
        def _run(p, xs, xr, yr):
            out = deid_multi_style(bundle, p, xs, xr, yr)
            if out_space == "uint8":
                out = jnp.clip(out * 255.0, 0, 255).astype(jnp.uint8)
            return out

        self._fn = jax.jit(_run)
        # Serving observability (see ``stats``): cumulative per-request
        # latencies and dispatch/queue gauges across serve() calls.
        self._latencies: list[float] = []
        self._batches_dispatched = 0
        self._completed = 0
        self._pending_gauge = 0
        self._inflight_gauge = 0
        self._max_queue_depth = 0

    def stats(self) -> dict:
        """Operational counters for the server.

        Returns request count, dispatched-batch count, per-request
        latency quantiles (submission -> result-on-host, seconds), and
        queue-depth gauges: ``pending`` (requests waiting for a batch),
        ``inflight_batches`` (dispatched, not yet drained), and
        ``max_queue_depth`` (max pending + in-flight requests observed).
        """
        lat = np.asarray(self._latencies, np.float64)
        q = lambda p: float(np.quantile(lat, p)) if lat.size else None  # noqa: E731
        return dict(
            completed=self._completed,
            batches_dispatched=self._batches_dispatched,
            latency_p50_s=q(0.50),
            latency_p99_s=q(0.99),
            latency_max_s=float(lat.max()) if lat.size else None,
            pending=self._pending_gauge,
            inflight_batches=self._inflight_gauge,
            max_queue_depth=self._max_queue_depth,
        )

    def reset_stats(self) -> None:
        self._latencies = []
        self._batches_dispatched = 0
        self._completed = 0
        self._max_queue_depth = 0

    def warmup(self) -> None:
        """Compile the serving program ahead of the first request."""
        n = self._bundle.cfg.model.img_size
        # Mid-gray, not zeros: an all-zero frame hits the camera's
        # 0/0 max-normalize (NaN) — harmless for a discarded warmup,
        # but a clean program output keeps debugging sane.
        dummy = np.full((self._batch, n, n, 3), 0.5, np.float32)
        jax.block_until_ready(self._dispatch(dummy))

    def _dispatch(self, batch_np: np.ndarray) -> jax.Array:
        x = jnp.asarray(batch_np)
        if self._in_shard is not None:
            x = jax.device_put(x, self._in_shard)
        return self._fn(self._params, x, self._x_ref, self._y_ref)

    def serve(
        self, images: Iterable[np.ndarray], max_wait_s: float | None = None
    ) -> Iterator[np.ndarray]:
        """Yield one (R, H, W, 3) float32 output per input image, in order.

        ``max_wait_s``: flush deadline for partial batches.  Without it
        a streaming caller that trickles requests waits until either
        ``batch_size`` friends arrive or the iterator ends; with it, a
        pending partial batch is padded and dispatched once the OLDEST
        pending request has waited ``max_wait_s`` seconds (the input
        iterable is then pulled on a background thread so a blocked
        producer cannot stall the deadline).
        """
        n = self._bundle.cfg.model.img_size
        # (result, valid count, arrival timestamps of the valid requests)
        inflight: list[tuple[jax.Array, int, list[float]]] = []

        def note_depth(n_pending: int) -> None:
            self._pending_gauge = n_pending
            self._inflight_gauge = len(inflight)
            self._max_queue_depth = max(
                self._max_queue_depth, n_pending + len(inflight) * self._batch
            )

        def drain(entry):
            fakes, valid, arrivals = entry
            host = np.asarray(fakes)  # (R, B, H, W, 3) — the only sync point
            done = time.monotonic()
            self._latencies.extend(done - t for t in arrivals)
            self._completed += valid
            self._inflight_gauge = len(inflight)
            for i in range(valid):
                yield host[:, i]

        def check(img) -> np.ndarray:
            img = np.asarray(img, dtype=np.float32)
            if img.shape != (n, n, 3):
                raise ValueError(f"expected ({n}, {n}, 3) image, got {img.shape}")
            return img

        def dispatch(pending: list[np.ndarray], arrivals: list[float]) -> None:
            # Pad by REPLICATING the last valid image, not with zeros:
            # an all-zero frame is degenerate for the camera's per-image
            # max-normalize (0/0 -> NaN, reference Optics.py:128) and
            # the generator's global skip-cache mean (reference
            # model.py:174 ``x - x.mean()``) couples samples, so one
            # NaN pad would poison every output in the batch.
            k = self._batch - len(pending)
            batch = np.stack(pending + [pending[-1]] * k) if k else np.stack(pending)
            inflight.append((self._dispatch(batch), len(pending), arrivals))
            self._batches_dispatched += 1
            note_depth(0)

        pending: list[np.ndarray] = []
        arrivals: list[float] = []
        if max_wait_s is None:
            for img in images:
                pending.append(check(img))
                arrivals.append(time.monotonic())
                note_depth(len(pending))
                if len(pending) == self._batch:
                    dispatch(pending, arrivals)
                    pending, arrivals = [], []
                    if len(inflight) > self._depth:
                        yield from drain(inflight.pop(0))
        else:
            import queue
            import threading

            q: queue.Queue = queue.Queue(maxsize=2 * self._batch)
            _END = object()

            errs: list[BaseException] = []

            def pull():
                try:
                    for img in images:
                        q.put(img)
                except BaseException as e:  # surfaced after drain
                    errs.append(e)
                finally:
                    q.put(_END)

            t = threading.Thread(target=pull, daemon=True)
            t.start()
            oldest: float | None = None
            done = False
            while not done:
                timeout = (
                    None
                    if oldest is None
                    else max(0.0, oldest + max_wait_s - time.monotonic())
                )
                try:
                    item = q.get(timeout=timeout)
                except queue.Empty:
                    # Deadline hit: the stream is idle, so dispatch the
                    # padded partial batch and drain EVERYTHING in
                    # flight — the waiting caller gets results now
                    # rather than when batch_size-1 friends arrive.
                    dispatch(pending, arrivals)
                    pending, arrivals, oldest = [], [], None
                    while inflight:
                        yield from drain(inflight.pop(0))
                    continue
                if item is _END:
                    if errs:
                        raise errs[0]
                    done = True
                    continue
                pending.append(check(item))
                arrivals.append(time.monotonic())
                note_depth(len(pending))
                if oldest is None:
                    oldest = time.monotonic()
                if len(pending) == self._batch:
                    dispatch(pending, arrivals)
                    pending, arrivals, oldest = [], [], None
                    if len(inflight) > self._depth:
                        yield from drain(inflight.pop(0))
        if pending:
            dispatch(pending, arrivals)
        for entry in inflight:
            yield from drain(entry)
        self._inflight_gauge = 0

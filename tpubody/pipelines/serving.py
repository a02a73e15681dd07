"""Online inference serving: dynamic micro-batching onto jitted XLA steps.

The reference is offline scripts; a production deployment needs an online
path, and on TPU its design follows from the compilation model:

  * XLA programs are shape-specialized, so arbitrary request counts must be
    padded to a SMALL, FIXED set of batch sizes (power-of-two buckets) —
    one compile per bucket, ever, instead of one per observed batch size.
  * The chip prefers large batches; single requests should coalesce.  The
    batcher gathers queued requests up to the largest bucket or until the
    oldest request has waited ``max_delay_ms`` — the standard
    latency/throughput knob.
  * Hosts submit, a single dispatch thread owns the device: no lock
    contention on the hot path, natural request ordering, and the next
    batch's host work overlaps the previous batch's device work.

Use :class:`InferenceServer` with any jittable ``step(images) -> pytree``;
:func:`hmr_smpl_step` builds the flagship images -> (verts, cam) step.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def hmr_smpl_step(dtype=jnp.bfloat16, n_joints: int = 24,
                  n_verts: int = 6890, stem: str = "conv7",
                  image_size: int = 224, quantize: bool = False,
                  calib_images=None,
                  ) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """The flagship serving step: images -> (posed verts, weak-persp cam).

    ``quantize=True`` serves the int8 PTQ backbone (models/hmr_quant:
    exact BN folding, per-channel weight + calibrated activation scales)
    instead of the bf16 Flax forward — pass real ``calib_images`` for a
    production deployment; a random calibration batch is only a
    throughput-benchmark stand-in.
    """
    from tpubody.models import hmr as hmr_lib
    from tpubody.models import params as params_lib
    from tpubody.models import smpl as smpl_lib

    model, variables = hmr_lib.create_hmr(
        dtype=jnp.float32 if quantize else dtype, stem=stem,
        image_size=image_size)
    body = params_lib.load_or_synthetic(
        "smpl", n_joints=n_joints, n_verts=n_verts, seed=0,
        warn=n_verts == 6890)
    use_pallas = jax.default_backend() == "tpu"

    if quantize:
        from tpubody.models import hmr_quant
        if calib_images is None:
            rng = np.random.default_rng(0)
            calib_images = jnp.asarray(
                rng.normal(scale=0.5,
                           size=(4, image_size, image_size, 3)),
                jnp.float32)
        qparams = hmr_quant.quantize_hmr(variables, calib_images)

        def step(images):
            out = hmr_quant.forward(qparams, images)
            verts = smpl_lib.forward_batch_verts(
                body, out.rotmats, out.shape, None,
                use_pallas=use_pallas, pose_is_rotmat=True)
            return verts, out.cam

        return step

    def step(images):
        out = model.apply(variables, images)
        verts = smpl_lib.forward_batch_verts(
            body, out.rotmats, out.shape, None,
            use_pallas=use_pallas, pose_is_rotmat=True)
        return verts, out.cam

    return step


def fit_smplh_step(model=None, config=None, dec_params=None):
    """Fitting-as-a-service: keypoint requests -> staged SMPLH fits.

    Returns ``(step, request_spec)`` for :class:`InferenceServer`: each
    request is ``{"keypoints": (67, 3) f32, "center": (2,) f32}`` (the
    OpenPose layout fit.keypoints reads) and each response slice is the
    per-request dict ``{"pose" (156,), "shape" (10,), "cam_t" (3,),
    "emb" (32,), "loss" ()}``.

    Keep ``buckets`` SMALL (e.g. ``(4,)``): every bucket compiles the
    full staged-fit program once (minutes on a TPU host); warm dispatch
    is sub-second per bucket (docs/STATUS.md production numbers).
    """
    from tpubody.fit import smplify
    from tpubody.pipelines import gen_smplh as gen_lib

    config = config or smplify.FitConfig()
    model = model if model is not None else gen_lib.default_fit_model(config)
    fitter = smplify.BatchFitter(model, config, dec_params=dec_params)

    def step(req):
        return fitter.apply(req["keypoints"], req["center"])

    # Keypoint-row contract per family: BODY_25 + hands + SMPL-X face rows
    # (the same layout fit.keypoints.read_openpose_json/joint_weights use).
    n_kp = 25
    if model.num_joints in (52, 55) and config.use_hands:
        n_kp += 42
    if model.num_joints == 55 and config.use_face:
        n_kp += 51 + 17 * config.use_face_contour
    spec = {"keypoints": jax.ShapeDtypeStruct((n_kp, 3), jnp.float32),
            "center": jax.ShapeDtypeStruct((2,), jnp.float32)}
    return step, spec


class ServerStats:
    """Thread-safe rolling serving statistics."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = 0
        self.batches = 0
        self.padded = 0          # wasted rows from bucket padding
        self._latencies: List[float] = []
        self._t0 = time.perf_counter()

    def record(self, n_real: int, n_padded: int, latencies: Sequence[float]):
        with self._lock:
            self.requests += n_real
            self.batches += 1
            self.padded += n_padded
            self._latencies.extend(latencies)
            if len(self._latencies) > 10000:
                self._latencies = self._latencies[-5000:]

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            dt = time.perf_counter() - self._t0
            return {
                "requests": self.requests,
                "batches": self.batches,
                "padded_rows": self.padded,
                "throughput_rps": self.requests / dt if dt > 0 else 0.0,
                "latency_p50_ms": 1e3 * lat[len(lat) // 2] if lat else 0.0,
                "latency_p99_ms":
                    1e3 * lat[int(len(lat) * 0.99)] if lat else 0.0,
            }


class _Request:
    __slots__ = ("value", "future", "t_submit")

    def __init__(self, value):
        self.value = value                 # pytree matching the server spec
        self.future: Future = Future()
        self.t_submit = time.perf_counter()


class InferenceServer:
    """Dynamic-batching server around one jitted step.

    Parameters
    ----------
    step: batched request pytree -> pytree with leading batch dim.
    buckets: allowed batch sizes, ascending (requests pad up to the
        smallest bucket that fits; at most ``len(buckets)`` compiles).
    max_delay_ms: maximum time the OLDEST queued request waits for
        coalescing before a smaller batch is dispatched.
    image_shape: per-request input shape (H, W, C) for the default
        single-image spec.
    request_spec: optional pytree of ``jax.ShapeDtypeStruct`` describing
        ONE request's inputs (no batch dim) — e.g. fit_smplh_step's
        ``{"keypoints": (67, 3), "center": (2,)}``.  Requests are stacked
        per leaf into the bucket batch.
    """

    def __init__(
        self,
        step: Callable,
        image_shape: Tuple[int, int, int] = (224, 224, 3),
        buckets: Sequence[int] = (1, 4, 16, 64, 256),
        max_delay_ms: float = 5.0,
        warmup: bool = True,
        sharding: Optional[Any] = None,
        to_host: bool = True,
        request_spec: Optional[Any] = None,
    ):
        """``sharding``: optional ``jax.sharding.Sharding`` for the batch
        axis (e.g. ``tpubody.dist.mesh.frames_sharding``) — batches land
        pre-sharded across the mesh and XLA runs the step SPMD.  Every
        bucket size must then be divisible by the mesh device count.

        ``to_host``: resolve futures to numpy (default).  Pass False to
        keep results as device arrays — futures then resolve to lazy
        per-request slices, and large outputs (e.g. 6890-vertex meshes)
        never cross the host boundary unless the consumer pulls them;
        chain device-side post-processing without a PCIe round-trip."""
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        if not self.buckets:
            raise ValueError("need at least one bucket size")
        self.sharding = sharding
        if sharding is not None:
            n_dev = len(sharding.device_set)
            bad = [b for b in self.buckets if b % n_dev]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by mesh size {n_dev}")
        self.image_shape = tuple(image_shape)
        # Per-request input spec: any pytree of ShapeDtypeStructs (one
        # request's leaves, WITHOUT the batch dim).  Default: a single
        # float32 image of ``image_shape`` — the original API, where
        # ``submit`` takes a bare ndarray.
        self.request_spec = (request_spec if request_spec is not None
                             else jax.ShapeDtypeStruct(self.image_shape,
                                                       jnp.float32))
        self._spec_leaves, self._spec_treedef = jax.tree_util.tree_flatten(
            self.request_spec)
        self.max_delay = max_delay_ms / 1e3
        self.to_host = to_host
        self._step = jax.jit(step)
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self.stats = ServerStats()
        self._thread: Optional[threading.Thread] = None
        if warmup:
            self.warmup()

    # -- lifecycle -------------------------------------------------------
    def _put(self, batch_tree):
        if self.sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.sharding), batch_tree)
        return jax.tree_util.tree_map(jnp.asarray, batch_tree)

    def _zeros_batch(self, bucket: int):
        return self._spec_treedef.unflatten([
            np.zeros((bucket,) + tuple(l.shape), l.dtype)
            for l in self._spec_leaves])

    def warmup(self) -> None:
        """Compile every bucket up front so no request pays a compile."""
        for b in self.buckets:
            jax.block_until_ready(self._step(
                self._put(self._zeros_batch(b))))

    def start(self) -> "InferenceServer":
        if self._thread is None:
            self.stats._t0 = time.perf_counter()  # exclude warmup compiles
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        # Fail any requests still queued (submitted but never dispatched)
        # so no client blocks forever on a future the loop will not serve.
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.future.set_exception(
                RuntimeError("InferenceServer stopped before this request "
                             "was dispatched"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- client API ------------------------------------------------------
    def submit(self, value) -> Future:
        """Enqueue one request (a pytree matching ``request_spec`` — a
        bare image ndarray under the default spec); the Future resolves to
        this request's slice of the step output pytree (leading batch dim
        stripped)."""
        leaves, treedef = jax.tree_util.tree_flatten(value)
        if treedef != self._spec_treedef:
            raise ValueError(
                f"request structure {treedef} != spec {self._spec_treedef}")
        cast = []
        for leaf, spec in zip(leaves, self._spec_leaves):
            arr = np.asarray(leaf, spec.dtype)
            if arr.shape != tuple(spec.shape):
                raise ValueError(
                    f"expected leaf shape {tuple(spec.shape)}, "
                    f"got {arr.shape}")
            cast.append(arr)
        if self._stop.is_set():
            raise RuntimeError("InferenceServer is stopped")
        req = _Request(treedef.unflatten(cast))
        self._q.put(req)
        # Close the submit/stop race: if stop() finished its drain between
        # our check and the put, this request sits in a dead queue — fail
        # it here rather than leaving the caller blocked on the future.
        if self._stop.is_set() and self._thread is None:
            while True:
                try:
                    r = self._q.get_nowait()
                except queue.Empty:
                    break
                r.future.set_exception(
                    RuntimeError("InferenceServer stopped before this "
                                 "request was dispatched"))
        return req.future

    def __call__(self, value):
        """Synchronous convenience wrapper."""
        return self.submit(value).result()

    # -- dispatch loop ---------------------------------------------------
    def _gather(self) -> List[_Request]:
        """Collect requests: block for the first, greedily drain whatever
        already queued up, then coalesce until the largest bucket is full
        or the oldest exceeds its delay budget.

        The greedy drain matters under sustained load: while a previous
        batch occupied the device, queued requests have typically waited
        past max_delay already, so a deadline-only policy would dispatch
        batch=1 forever exactly when large batches are needed most.
        """
        try:
            first = self._q.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        max_b = self.buckets[-1]
        # Backlog drain: everything already waiting joins this batch.
        while len(batch) < max_b:
            try:
                batch.append(self._q.get_nowait())
            except queue.Empty:
                break
        # Coalescing wait: only while the batch is still below the largest
        # bucket and the oldest request's delay budget has not expired.
        deadline = first.t_submit + self.max_delay
        while len(batch) < max_b:
            remain = deadline - time.perf_counter()
            if remain <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remain))
            except queue.Empty:
                break
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._gather()
            if not batch:
                continue
            n = len(batch)
            bucket = next((b for b in self.buckets if b >= n),
                          self.buckets[-1])
            # More requests than the largest bucket never happens:
            # _gather stops at buckets[-1].
            batch_tree = self._zeros_batch(bucket)
            batch_leaves = jax.tree_util.tree_leaves(batch_tree)
            for i, r in enumerate(batch):
                for dst, src in zip(batch_leaves,
                                    jax.tree_util.tree_leaves(r.value)):
                    dst[i] = src
            try:
                out = self._step(self._put(batch_tree))
                if self.to_host:
                    out = jax.tree_util.tree_map(np.asarray, out)
                else:
                    jax.block_until_ready(out)
            except BaseException as e:
                for r in batch:
                    r.future.set_exception(e)
                continue
            t_done = time.perf_counter()
            for i, r in enumerate(batch):
                r.future.set_result(
                    jax.tree_util.tree_map(lambda a, i=i: a[i], out))
            self.stats.record(n, bucket - n,
                              [t_done - r.t_submit for r in batch])

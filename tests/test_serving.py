"""Dynamic-batching inference server: correctness, bucketing, concurrency."""
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpubody.pipelines import serving


SHAPE = (8, 8, 3)


def double_step(images):
    return images * 2.0, jnp.sum(images, axis=(1, 2, 3))


@pytest.fixture()
def server():
    s = serving.InferenceServer(
        double_step, image_shape=SHAPE, buckets=(1, 2, 4),
        max_delay_ms=10.0)
    with s:
        yield s


class TestServer:
    def test_single_request_roundtrip(self, server):
        rng = np.random.default_rng(0)
        img = rng.normal(size=SHAPE).astype(np.float32)
        doubled, total = server(img)
        np.testing.assert_allclose(doubled, img * 2.0, rtol=1e-6)
        np.testing.assert_allclose(total, img.sum(), rtol=1e-4)

    def test_concurrent_requests_map_to_own_results(self, server):
        rng = np.random.default_rng(1)
        imgs = [rng.normal(size=SHAPE).astype(np.float32) for _ in range(9)]
        futures = [server.submit(im) for im in imgs]
        for im, f in zip(imgs, futures):
            doubled, _ = f.result(timeout=30)
            np.testing.assert_allclose(doubled, im * 2.0, rtol=1e-6)
        snap = server.stats.snapshot()
        assert snap["requests"] == 9
        assert snap["batches"] >= 3      # bucket cap is 4
        assert snap["latency_p50_ms"] > 0

    def test_coalescing_under_parallel_load(self, server):
        """Many threads submitting at once should produce fewer batches
        than requests (micro-batching engaged)."""
        rng = np.random.default_rng(2)
        imgs = [rng.normal(size=SHAPE).astype(np.float32)
                for _ in range(16)]
        results = [None] * 16

        def send(i):
            results[i] = server(imgs[i])

        threads = [threading.Thread(target=send, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(16):
            np.testing.assert_allclose(results[i][0], imgs[i] * 2.0,
                                       rtol=1e-6)
        snap = server.stats.snapshot()
        assert snap["batches"] < snap["requests"]

    def test_shape_validation(self, server):
        with pytest.raises(ValueError):
            server.submit(np.zeros((4, 4, 3), np.float32))

    def test_stop_fails_pending_futures(self):
        """Requests still queued when the server stops must resolve with
        an error, not hang their clients forever."""
        s = serving.InferenceServer(
            double_step, image_shape=SHAPE, buckets=(1, 2, 4),
            max_delay_ms=10.0)
        # Never started: submissions sit in the queue.
        f = s.submit(np.zeros(SHAPE, np.float32))
        s.stop()
        with pytest.raises(RuntimeError, match="stopped"):
            f.result(timeout=5)

    def test_submit_after_stop_raises(self):
        """A submit racing (or following) stop() must error immediately
        rather than leave its future forever unresolved."""
        s = serving.InferenceServer(
            double_step, image_shape=SHAPE, buckets=(1, 2),
            max_delay_ms=1.0).start()
        s(np.zeros(SHAPE, np.float32))
        s.stop()
        with pytest.raises(RuntimeError, match="stopped"):
            s.submit(np.zeros(SHAPE, np.float32))

    def test_step_error_propagates(self):
        def bad_step(images):
            return jnp.linalg.cholesky(
                jnp.zeros((2, 2)) * images[0, 0, 0, 0]), images

        s = serving.InferenceServer(
            lambda x: (_ for _ in ()).throw(RuntimeError("kernel boom")),
            image_shape=SHAPE, buckets=(1,), warmup=False)
        with s:
            f = s.submit(np.zeros(SHAPE, np.float32))
            with pytest.raises(RuntimeError, match="kernel boom"):
                f.result(timeout=30)


@pytest.mark.slow
def test_hmr_smpl_step_builds_and_runs():
    step = serving.hmr_smpl_step(dtype=jnp.float32, n_verts=64)
    out = jax.jit(step)(jnp.zeros((2, 224, 224, 3), jnp.float32))
    verts, cam = out
    assert verts.shape == (2, 64, 3)
    assert cam.shape == (2, 3)


@pytest.mark.slow  # real ResNet init + PTQ calibration compile (1-core CPU)
def test_hmr_smpl_step_quantized():
    """The int8 serving step produces the same output structure with
    finite values (fidelity itself is pinned by test_hmr_quant)."""
    step = serving.hmr_smpl_step(n_verts=64, image_size=48, quantize=True)
    verts, cam = jax.jit(step)(jnp.zeros((2, 48, 48, 3), jnp.float32))
    assert verts.shape == (2, 64, 3)
    assert cam.shape == (2, 3)
    assert np.isfinite(np.asarray(verts)).all()


def test_sharded_server_on_mesh():
    """Batches land pre-sharded on the frames mesh; SPMD step results are
    exact per request."""
    from tpubody.dist import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(4)
    sharding = mesh_lib.frames_sharding(mesh)
    s = serving.InferenceServer(
        double_step, image_shape=SHAPE, buckets=(4, 8),
        max_delay_ms=20.0, sharding=sharding)
    rng = np.random.default_rng(3)
    imgs = [rng.normal(size=SHAPE).astype(np.float32) for _ in range(6)]
    with s:
        futs = [s.submit(im) for im in imgs]
        for im, f in zip(imgs, futs):
            doubled, _ = f.result(timeout=30)
            np.testing.assert_allclose(doubled, im * 2.0, rtol=1e-6)


def test_sharded_server_rejects_indivisible_buckets():
    from tpubody.dist import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(4)
    sharding = mesh_lib.frames_sharding(mesh)
    with pytest.raises(ValueError, match="not divisible"):
        serving.InferenceServer(double_step, image_shape=SHAPE,
                                buckets=(1, 4), sharding=sharding,
                                warmup=False)


def test_device_resident_results():
    """to_host=False resolves futures to device arrays (no host copy on
    the dispatch path); values still exact."""
    s = serving.InferenceServer(
        double_step, image_shape=SHAPE, buckets=(1, 2),
        max_delay_ms=5.0, to_host=False)
    rng = np.random.default_rng(4)
    img = rng.normal(size=SHAPE).astype(np.float32)
    with s:
        doubled, total = s(img)
    assert isinstance(doubled, jax.Array)
    np.testing.assert_allclose(np.asarray(doubled), img * 2.0, rtol=1e-6)


class TestBacklogBatching:
    def test_backlogged_requests_coalesce_not_batch1(self):
        """Requests that waited past max_delay while the device was busy
        must still coalesce into large batches (backlog drain in _gather),
        not degrade to batch=1 dispatches."""
        s = serving.InferenceServer(
            double_step, image_shape=SHAPE, buckets=(1, 2, 8),
            max_delay_ms=1.0)   # tiny budget: every queued req is "late"
        rng = np.random.default_rng(3)
        imgs = [rng.normal(size=SHAPE).astype(np.float32)
                for _ in range(16)]
        # Queue everything BEFORE the dispatch loop starts, simulating a
        # backlog accumulated while a previous batch held the device.
        futures = [s.submit(im) for im in imgs]
        with s:
            for im, f in zip(imgs, futures):
                doubled, _ = f.result(timeout=30)
                np.testing.assert_allclose(doubled, im * 2.0, rtol=1e-6)
        snap = s.stats.snapshot()
        # 16 backlogged requests at bucket cap 8 need only 2-3 batches;
        # the old deadline-only policy dispatched 16 batches of 1.
        assert snap["batches"] <= 4, snap


class TestBucketRecompiles:
    def test_mixed_load_traces_once_per_bucket(self):
        """Mixed batch sizes over time must only ever compile one program
        per bucket shape — the bucket design's whole point (the stated
        recompile risk of pipelines/serving.py)."""
        traces = []

        def counting_step(images):
            traces.append(images.shape)   # runs once per trace/shape
            return images * 2.0, jnp.sum(images, axis=(1, 2, 3))

        s = serving.InferenceServer(
            counting_step, image_shape=SHAPE, buckets=(1, 2, 4),
            max_delay_ms=5.0)
        rng = np.random.default_rng(7)
        with s:
            # waves of 1, 3, 4, 2, 5 concurrent requests
            for wave in (1, 3, 4, 2, 5):
                imgs = [rng.normal(size=SHAPE).astype(np.float32)
                        for _ in range(wave)]
                futs = [s.submit(im) for im in imgs]
                for im, f in zip(imgs, futs):
                    doubled, _ = f.result(timeout=60)
                    np.testing.assert_allclose(doubled, im * 2.0,
                                               rtol=1e-6)
        shapes = {t[0] for t in traces}
        assert shapes <= {1, 2, 4}, shapes          # only bucket shapes
        assert len(traces) <= 3, traces             # one trace per bucket


class TestPytreeRequests:
    def test_dict_request_spec_roundtrip(self):
        """Requests can be pytrees (dict of arrays), stacked per leaf and
        sliced back per request."""
        spec = {"a": jax.ShapeDtypeStruct((2,), jnp.float32),
                "b": jax.ShapeDtypeStruct((3,), jnp.float32)}

        def step(req):
            return {"sum": req["a"].sum(axis=1) + req["b"].sum(axis=1),
                    "a2": req["a"] * 2.0}

        s = serving.InferenceServer(step, buckets=(1, 2),
                                    max_delay_ms=5.0, request_spec=spec)
        with s:
            rng = np.random.default_rng(0)
            reqs = [{"a": rng.normal(size=(2,)).astype(np.float32),
                     "b": rng.normal(size=(3,)).astype(np.float32)}
                    for _ in range(3)]
            futs = [s.submit(r) for r in reqs]
            for r, f in zip(reqs, futs):
                out = f.result(timeout=30)
                np.testing.assert_allclose(
                    out["sum"], r["a"].sum() + r["b"].sum(), rtol=1e-5)
                np.testing.assert_allclose(out["a2"], r["a"] * 2.0,
                                           rtol=1e-6)

    def test_structure_mismatch_rejected(self):
        spec = {"a": jax.ShapeDtypeStruct((2,), jnp.float32)}
        s = serving.InferenceServer(lambda req: req["a"], buckets=(1,),
                                    request_spec=spec, warmup=False)
        with pytest.raises(ValueError, match="structure"):
            s.submit(np.zeros(2, np.float32))
        with pytest.raises(ValueError, match="leaf shape"):
            s.submit({"a": np.zeros(3, np.float32)})


@pytest.mark.slow
def test_fit_smplh_serving():
    """Fitting-as-a-service: keypoint requests coalesce into one staged-fit
    program; each future resolves to its own SMPLH fit."""
    from tpubody.fit import smplify
    from tpubody.models import params as params_lib

    model = params_lib.synthetic(n_joints=52, n_verts=200, seed=0)
    cfg = smplify.FitConfig(
        focal_length=500.0, maxiters=2, try_both_orient=False,
        side_view_thsh=0.0,
        data_weights=(1.0,), body_pose_prior_weights=(404.0,),
        shape_weights=(100.0,), hand_pose_prior_weights=(404.0,),
        hand_joints_weights=(0.0,), coll_loss_weights=(0.0,))
    step, spec = serving.fit_smplh_step(model=model, config=cfg)
    s = serving.InferenceServer(step, buckets=(2,), max_delay_ms=50.0,
                                request_spec=spec)
    rng = np.random.default_rng(0)
    with s:
        futs = []
        for i in range(3):
            kps = np.zeros((67, 3), np.float32)
            kps[:, :2] = 128 + 40 * rng.normal(size=(67, 2))
            kps[:, 2] = 1.0
            futs.append(s.submit(
                {"keypoints": kps,
                 "center": np.array([128.0, 128.0], np.float32)}))
        for f in futs:
            out = f.result(timeout=600)
            assert out["pose"].shape == (156,)
            assert np.isfinite(np.asarray(out["pose"])).all()
            assert np.isfinite(np.asarray(out["loss"]))

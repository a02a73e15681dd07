"""Input pipeline: preprocessing, augmentation, collation, device prefetch."""
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpubody.io import dataset as ds


class TestPreprocess:
    def test_keypoints_map_into_crop(self):
        ex = ds.synthetic_hmr_dataset(1, image_size=96, seed=1)[0]
        out = ds.preprocess_example(ex, size=64)
        assert out.image.shape == (64, 64, 3)
        # normalized ImageNet stats: roughly zero-centered
        assert abs(float(out.image.mean())) < 3.0
        # all originally-valid keypoints land inside the crop (with margin)
        assert (out.keypoints2d[:, 0] > -5).all()
        assert (out.keypoints2d[:, 0] < 69).all()

    def test_keypoint_transform_is_affine_consistent(self):
        """Two keypoints' pixel distance scales by the crop ratio."""
        ex = ds.synthetic_hmr_dataset(1, image_size=128, seed=2)[0]
        out = ds.preprocess_example(ex, size=64)
        d_in = np.linalg.norm(ex.keypoints2d[0, :2] - ex.keypoints2d[1, :2])
        d_out = np.linalg.norm(out.keypoints2d[0, :2]
                               - out.keypoints2d[1, :2])
        from tpubody.image.ops import crop_from_keypoints
        _, scale = crop_from_keypoints(ex.keypoints2d)
        ratio = 64 / (scale * 200.0)
        np.testing.assert_allclose(d_out, d_in * ratio, rtol=1e-4)


class TestAugment:
    def test_flip_is_involution(self):
        ex = ds.preprocess_example(
            ds.synthetic_hmr_dataset(1, image_size=64, seed=3)[0], size=64)
        rng = np.random.default_rng(0)
        once = ds.random_flip(ex, rng, p=1.0)
        twice = ds.random_flip(once, rng, p=1.0)
        np.testing.assert_allclose(twice.image, ex.image, atol=1e-6)
        np.testing.assert_allclose(twice.keypoints2d, ex.keypoints2d,
                                   atol=1e-4)
        np.testing.assert_allclose(twice.gt_rotmats, ex.gt_rotmats,
                                   atol=1e-6)

    def test_flip_mirrors_rotations_properly(self):
        """Flipped rotations stay rotations (det +1, orthonormal)."""
        ex = ds.preprocess_example(
            ds.synthetic_hmr_dataset(1, image_size=64, seed=4)[0], size=64)
        rot = np.array(ex.gt_rotmats)
        # give joint 1 a real rotation so the conjugation is non-trivial
        th = 0.7
        rot[1] = np.array([[np.cos(th), -np.sin(th), 0],
                           [np.sin(th), np.cos(th), 0],
                           [0, 0, 1]], np.float32)
        ex = ds.HMRExample(ex.image, ex.keypoints2d, rot, ex.gt_shape)
        f = ds.random_flip(ex, np.random.default_rng(0), p=1.0)
        dets = np.linalg.det(f.gt_rotmats)
        np.testing.assert_allclose(dets, 1.0, atol=1e-5)
        # left/right swap: flipped joint 2 carries (mirrored) joint 1's rot
        assert not np.allclose(f.gt_rotmats[2], np.eye(3))

    def test_jitter_scale_keeps_shapes(self):
        ex = ds.preprocess_example(
            ds.synthetic_hmr_dataset(1, image_size=64, seed=5)[0], size=64)
        j = ds.jitter_scale(ex, np.random.default_rng(1))
        assert j.image.shape == ex.image.shape
        assert j.keypoints2d.shape == ex.keypoints2d.shape


class TestRenderedDataset:
    @pytest.mark.slow  # renders humanoid batches + a train-step compile
    def test_rendered_hmr_dataset_trains(self):
        """Renderer-supervised examples carry TRUE labels: rotmats are
        valid rotations, keypoints lie in frame, and a few HMR train
        steps descend on them."""
        import optax

        from tpubody.models import hmr as hmr_lib
        from tpubody.models import hmr_train
        from tpubody.models import params as params_lib

        data = ds.rendered_hmr_dataset(8, image_size=48, seed=0)
        ex = data[0]
        assert ex.image.dtype == np.uint8
        dets = np.linalg.det(ex.gt_rotmats)
        np.testing.assert_allclose(dets, 1.0, atol=1e-4)
        inframe = ex.keypoints2d[ex.keypoints2d[:, 2] > 0]
        assert (inframe[:, :2] >= 0).all() and (inframe[:, :2] < 48).all()

        size = 32
        model = hmr_lib.HMR(mean_params=hmr_lib.default_mean_params(),
                            n_iter=1, dtype=jnp.float32)
        smpl = params_lib.synthetic(n_joints=24, n_verts=64, seed=0)
        tx = optax.adam(1e-4)
        state = hmr_train.create_train_state(model, tx, image_size=size)
        step = jax.jit(hmr_train.make_train_step(
            model, smpl, tx, img_size=float(size)))
        batch = ds.collate([ds.preprocess_example(e, size=size)
                            for e in data._examples])
        rng = jax.random.PRNGKey(0)
        losses = []
        for i in range(4):
            state, metrics = step(state, batch, jax.random.fold_in(rng, i))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestLoader:
    def test_undersized_dataset_raises_not_hangs(self):
        """dataset < batch_size with drop_last can never form a batch; with
        num_epochs=None the worker would spin forever while the consumer
        blocks — must be a constructor error instead."""
        data = ds.ArrayDataset([
            ds.preprocess_example(e, size=16)
            for e in ds.synthetic_hmr_dataset(4, image_size=24, seed=0)
            ._examples])
        with pytest.raises(ValueError, match="drop_last"):
            ds.DeviceLoader(data, batch_size=32, num_epochs=None)
        # but a partial final batch is fine when drop_last is off
        loader = ds.DeviceLoader(data, batch_size=32, drop_last=False)
        assert len(list(loader)) == 1

    def test_collate_shapes_and_masking(self):
        exs = [ds.preprocess_example(e, size=32)
               for e in ds.synthetic_hmr_dataset(4, image_size=48, seed=6)
               ._examples]
        # drop GT on one example
        exs[2] = ds.HMRExample(exs[2].image, exs[2].keypoints2d, None, None)
        batch = ds.collate(exs)
        assert batch.images.shape == (4, 32, 32, 3)
        assert batch.gt_rotmats.shape == (4, 24, 3, 3)
        np.testing.assert_array_equal(batch.has_smpl, [1, 1, 0, 1])

    def test_device_loader_yields_sharded_batches(self):
        from tpubody.dist import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(8)
        sharding = mesh_lib.frames_sharding(mesh)
        data = ds.ArrayDataset([
            ds.preprocess_example(e, size=32)
            for e in ds.synthetic_hmr_dataset(32, image_size=48, seed=7)
            ._examples])
        loader = ds.DeviceLoader(data, batch_size=16, sharding=sharding,
                                 seed=0, prefetch=2)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert isinstance(b.images, jax.Array)
        assert b.images.sharding.is_equivalent_to(sharding, b.images.ndim)
        # device data is consumable by a jitted reduction
        assert np.isfinite(float(jnp.mean(b.images)))

    def test_device_loader_never_drops_batches(self):
        """Regression: the worker's end-of-data sentinel must never
        displace a queued batch (a race that intermittently lost the
        first batch when the producer finished before the consumer's
        first get). Many fresh iterators, exact batch count each time."""
        data = ds.ArrayDataset([
            ds.preprocess_example(e, size=16)
            for e in ds.synthetic_hmr_dataset(32, image_size=24, seed=7)
            ._examples])
        for trial in range(30):
            loader = ds.DeviceLoader(data, batch_size=16, seed=trial,
                                     prefetch=2)
            assert len(list(loader)) == 2, trial

    @pytest.mark.slow
    def test_device_loader_feeds_train_step(self):
        """End-to-end: loader batches drive the sharded HMR train step."""
        import optax
        from tpubody.dist import mesh as mesh_lib
        from tpubody.models import hmr as hmr_lib
        from tpubody.models import hmr_train
        from tpubody.models import params as params_lib

        mesh = mesh_lib.make_mesh(4)
        data_sh = mesh_lib.frames_sharding(mesh)
        rep_sh = mesh_lib.replicated(mesh)

        size = 32
        model = hmr_lib.HMR(mean_params=hmr_lib.default_mean_params(),
                            n_iter=1, dtype=jnp.float32)
        smpl = params_lib.synthetic(n_joints=24, n_verts=64, seed=0)
        tx = optax.sgd(1e-4)
        state = hmr_train.create_train_state(model, tx, image_size=size)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep_sh), state)
        step = jax.jit(
            hmr_train.make_train_step(model, smpl, tx, img_size=float(size)),
            in_shardings=(rep_sh, data_sh, None),
            out_shardings=(rep_sh, rep_sh))

        data = ds.ArrayDataset([
            ds.preprocess_example(e, size=size)
            for e in ds.synthetic_hmr_dataset(8, image_size=48, seed=8)
            ._examples])
        loader = ds.DeviceLoader(
            data, batch_size=8, sharding=data_sh, seed=0,
            transforms=[lambda e, r: ds.random_flip(e, r, p=0.5)])
        losses = []
        for batch in loader:
            state, metrics = step(state, batch, jax.random.PRNGKey(0))
            losses.append(float(metrics["loss"]))
        assert losses and all(np.isfinite(l) for l in losses)

    def test_loader_multi_epoch_and_len(self):
        data = ds.ArrayDataset([
            ds.preprocess_example(e, size=16)
            for e in ds.synthetic_hmr_dataset(10, image_size=32, seed=9)
            ._examples])
        loader = ds.DeviceLoader(data, batch_size=4, num_epochs=2,
                                 drop_last=True, seed=1)
        assert len(loader) == 2
        assert sum(1 for _ in loader) == 4  # 2 per epoch x 2 epochs

    def test_worker_error_propagates(self):
        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise RuntimeError("boom")

        loader = ds.DeviceLoader(Bad(), batch_size=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)


class TestLoaderShutdown:
    def test_abandoned_iterator_stops_worker(self):
        """Taking a few batches and dropping the iterator must terminate
        the prefetch worker (no leaked thread blocking on q.put)."""
        import threading

        from tpubody.io import dataset as ds

        data = ds.synthetic_hmr_dataset(n=32, image_size=8)
        loader = ds.DeviceLoader(data, batch_size=2, num_epochs=None,
                                 prefetch=2)
        before = threading.active_count()
        it = iter(loader)
        for _ in range(3):
            next(it)
        it.close()          # what `del it` / GC does via GeneratorExit
        deadline = time.time() + 10.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before

"""Frames-axis sharding over a multi-device mesh (virtual 8-CPU devices,
forced by conftest.py — SURVEY.md §2.3/§5 'distributed')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpubody.dist import mesh as mesh_lib
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return mesh_lib.make_mesh(8)


class TestMeshHelpers:
    def test_make_mesh(self, mesh8):
        assert mesh8.shape == {"frames": 8}

    def test_pad_frames(self):
        x = jnp.arange(10)[:, None] * jnp.ones((10, 3))
        p = mesh_lib.pad_frames(x, 8)
        assert p.shape[0] == 16
        np.testing.assert_allclose(
            np.asarray(p[10:]),
            np.broadcast_to(np.asarray(p[9]), (6, 3)))

    def test_shard_frames_distributes(self, mesh8):
        x = jnp.zeros((16, 4))
        sx = mesh_lib.shard_frames(x, mesh8)
        assert len(sx.sharding.device_set) == 8


class TestShardedLBS:
    def test_sharded_batch_matches_single_device(self, mesh8):
        """LBS over frames sharded on 8 devices == unsharded result."""
        model = params_lib.synthetic(n_joints=24, n_verts=200, seed=3)
        rng = np.random.default_rng(0)
        poses = jnp.asarray(rng.normal(scale=0.2, size=(16, 24, 3)),
                            jnp.float32)
        beta = jnp.asarray(rng.normal(size=(10,)), jnp.float32)

        ref = smpl_lib.forward_batch(model, poses, beta, None).verts

        data_sh = mesh_lib.frames_sharding(mesh8)
        rep_sh = mesh_lib.replicated(mesh8)
        poses_s = jax.device_put(poses, data_sh)
        model_s = mesh_lib.replicate(model, mesh8)

        fn = jax.jit(
            lambda m, p, b: smpl_lib.forward_batch(m, p, b, None).verts,
            in_shardings=(rep_sh, data_sh, rep_sh),
            out_shardings=data_sh)
        out = fn(model_s, poses_s, jax.device_put(beta, rep_sh))
        assert len(out.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_sharded_reduction_uses_collective(self, mesh8):
        """A replicated mean over sharded frames forces a psum/all-reduce;
        result must match."""
        model = params_lib.synthetic(n_joints=24, n_verts=150, seed=4)
        poses = jnp.asarray(
            np.random.default_rng(1).normal(scale=0.2, size=(8, 24, 3)),
            jnp.float32)
        beta = jnp.zeros(10)
        data_sh = mesh_lib.frames_sharding(mesh8)
        rep_sh = mesh_lib.replicated(mesh8)

        fn = jax.jit(
            lambda p: jnp.mean(
                smpl_lib.forward_batch(model, p, beta, None).verts),
            in_shardings=(data_sh,), out_shardings=rep_sh)
        got = float(fn(jax.device_put(poses, data_sh)))
        want = float(jnp.mean(
            smpl_lib.forward_batch(model, poses, beta, None).verts))
        assert abs(got - want) < 1e-5

    @pytest.mark.slow
    def test_graft_dryrun_smoke(self):
        """The driver's multichip dry run must pass on the CPU mesh."""
        import importlib.util, sys, os
        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(4)


class TestShardedAnimation:
    def test_animate_video_over_mesh(self, mesh8, tmp_path):
        """Video pipeline with the frame axis sharded over 8 devices."""
        import os
        from tests.test_animate import _sphere_avatar
        from tpubody.io import motion as motion_lib
        from tpubody.pipelines import animate as animate_lib

        av = _sphere_avatar()
        clip = motion_lib.MotionClip(
            poses=np.zeros((8, 24, 3)), trans=np.zeros((8, 3)), fps=30.0)
        out = str(tmp_path / "sharded.mp4")
        animate_lib.animate_video(
            av, clip, out, size=64, focal=150.0,
            cam_t=np.array([0.0, 0.0, 3.0]), chunk=8, mesh=mesh8)
        assert os.path.exists(out) and os.path.getsize(out) > 300

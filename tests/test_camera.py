import jax.numpy as jnp
import numpy as np

from tpubody.render import camera as cam_lib


def test_pinhole_projection_center():
    """A point on the optical axis projects to the principal point."""
    K = cam_lib.Intrinsics.make(5000.0, 5000.0, 512.0, 512.0)
    pts = jnp.asarray([[0.0, 0.0, 10.0]])
    uv = np.asarray(cam_lib.project_points(pts, K))
    np.testing.assert_allclose(uv[0], [512.0, 512.0], atol=1e-4)


def test_world_to_cam_convention():
    """JRender convention: x_cam = R @ (x + T)  (utils/J_render.py:49-63)."""
    rng = np.random.default_rng(0)
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    T = rng.normal(size=(3,))
    pts = rng.normal(size=(5, 3))
    got = np.asarray(cam_lib.world_to_cam(
        jnp.asarray(pts, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(T, jnp.float32)))
    want = (R @ (pts + T).T).T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_perspective_projection_batch():
    rng = np.random.default_rng(1)
    B, N = 2, 7
    pts = rng.normal(size=(B, N, 3)) + np.array([0, 0, 5.0])
    R = np.broadcast_to(np.eye(3), (B, 3, 3))
    t = np.zeros((B, 3))
    center = np.full((B, 2), 100.0)
    uv = np.asarray(cam_lib.perspective_projection(
        jnp.asarray(pts, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32), 500.0, jnp.asarray(center, jnp.float32)))
    want = pts[..., :2] / pts[..., 2:3] * 500.0 + 100.0
    np.testing.assert_allclose(uv, want, rtol=1e-4, atol=1e-3)


def test_estimate_translation_recovers_gt():
    """Project with a known translation, then recover it by weighted LSQ."""
    rng = np.random.default_rng(2)
    J3 = rng.normal(scale=0.4, size=(24, 3))
    t_gt = np.array([0.12, -0.3, 8.0])
    f = 5000.0
    center = np.array([512.0, 512.0])
    cam_pts = J3 + t_gt
    J2 = cam_pts[:, :2] / cam_pts[:, 2:3] * f + center
    conf = np.ones(24)
    t = np.asarray(cam_lib.estimate_translation(
        jnp.asarray(J3, jnp.float32), jnp.asarray(J2, jnp.float32),
        jnp.asarray(conf, jnp.float32), f, jnp.asarray(center, jnp.float32)))
    np.testing.assert_allclose(t, t_gt, atol=2e-2)


def test_estimate_translation_ignores_zero_conf():
    rng = np.random.default_rng(3)
    J3 = rng.normal(scale=0.4, size=(10, 3))
    t_gt = np.array([0.0, 0.1, 6.0])
    f = 1000.0
    center = np.array([100.0, 100.0])
    cam_pts = J3 + t_gt
    J2 = cam_pts[:, :2] / cam_pts[:, 2:3] * f + center
    # Corrupt half the joints but zero their confidence.
    J2_bad = J2.copy()
    J2_bad[5:] += 500.0
    conf = np.ones(10)
    conf[5:] = 0.0
    t = np.asarray(cam_lib.estimate_translation(
        jnp.asarray(J3, jnp.float32), jnp.asarray(J2_bad, jnp.float32),
        jnp.asarray(conf, jnp.float32), f, jnp.asarray(center, jnp.float32)))
    np.testing.assert_allclose(t, t_gt, atol=5e-2)


def test_weak_perspective_translation():
    cam = jnp.asarray([[1.0, 0.2, -0.1]])
    t = np.asarray(cam_lib.weak_perspective_translation(cam, 5000.0, 224.0))
    np.testing.assert_allclose(t[0, :2], [0.2, -0.1], atol=1e-6)
    np.testing.assert_allclose(t[0, 2], 2 * 5000.0 / 224.0, rtol=1e-6)

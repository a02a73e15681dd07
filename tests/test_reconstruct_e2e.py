"""End-to-end reconstruction pipeline smoke test on a synthetic body.

Builds a sphere-mesh ``BodyModelParams`` (valid closed topology, unlike the
random-face synthetic models), renders it as the "photo", and runs the full
main.py-parity pipeline: SMPLH forward -> value maps -> warp -> depth ->
stitch -> rig -> avatar.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.models import params as params_lib
from tpubody.pipelines import reconstruct as rec


def _sphere(n_theta=16, n_phi=16, r=0.5):
    verts, faces = [], []
    for i in range(n_theta):
        for j in range(n_phi):
            th = np.pi * (i + 0.5) / n_theta
            ph = 2 * np.pi * j / n_phi
            verts.append([r * np.sin(th) * np.cos(ph),
                          r * np.cos(th),
                          r * np.sin(th) * np.sin(ph)])
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces.append([a, b, c]); faces.append([b, d, c])
    return np.asarray(verts), np.asarray(faces, np.int32)


def _sphere_body(n_joints):
    """BodyModelParams over a sphere mesh with plausible joints/weights."""
    verts, faces = _sphere()
    rng = np.random.default_rng(0)
    parents = (params_lib.SMPL_PARENTS if n_joints == 24
               else params_lib.SMPLH_PARENTS)
    joints = np.zeros((n_joints, 3))
    for i in range(1, n_joints):
        d = rng.normal(size=3); d /= np.linalg.norm(d)
        joints[i] = joints[parents[i]] + d * 0.08
    dist = np.linalg.norm(verts[:, None] - joints[None], axis=-1)
    w = np.exp(-dist / 0.05); w /= w.sum(1, keepdims=True)
    prox = np.exp(-dist.T / 0.03); jreg = prox / prox.sum(1, keepdims=True)
    V = verts.shape[0]
    return params_lib.BodyModelParams(
        v_template=jnp.asarray(verts, jnp.float32),
        shapedirs=jnp.asarray(rng.normal(scale=1e-3, size=(V, 3, 10)),
                              jnp.float32),
        posedirs=jnp.asarray(
            rng.normal(scale=1e-4, size=(V, 3, 9 * (n_joints - 1))),
            jnp.float32),
        j_regressor=jnp.asarray(jreg, jnp.float32),
        weights=jnp.asarray(w, jnp.float32),
        parents=tuple(parents),
        faces=faces,
    )


@pytest.mark.slow
def test_full_pipeline_runs(tmp_path):
    H = W = 128
    smplh = _sphere_body(52)
    smpl = _sphere_body(24)

    fit = rec.FitResult(
        shape=np.zeros(10),
        pose=np.zeros(156),
        camera_center=np.array([W / 2, H / 2], np.float64),
        camera_rotation=np.eye(3),
        camera_translation=np.array([0.0, 0.0, 12.0]),
        camera_fx=1000.0,
    )

    # "Photo": a slightly larger ellipse silhouette than the rendered body.
    yy, xx = np.mgrid[0:H, 0:W]
    mask = ((((xx - W / 2) / 50.0) ** 2 + ((yy - H / 2) / 44.0) ** 2) < 1
            ).astype(np.uint8) * 255
    front_rgb = np.tile(np.array([180, 120, 90], np.uint8), (H, W, 1))
    back_rgb = np.tile(np.array([90, 120, 180], np.uint8), (H, W, 1))

    out = rec.reconstruct(front_rgb, back_rgb, mask, fit, smplh, smpl,
                          out_dir=str(tmp_path), cache=True)

    assert np.isfinite(out.avatar.v_template).all()
    assert out.avatar.weights.shape[1] == 24
    assert out.points.shape[1] == 30
    assert out.joints3d.shape == (24, 3)

    # Side-car artifacts with the reference's filenames exist.
    for name in ("smplh_value.npy", "warp_and_filled.npy",
                 "depth_front.npy", "depth_back.npy", "or_recover.pkl",
                 "out.ply"):
        assert (tmp_path / name).exists(), name

    # The skinned GLB export parses and carries the avatar's skeleton.
    from tpubody.mesh import gltf as gltf_lib
    g, _ = gltf_lib.read_glb(str(tmp_path / "out.glb"))
    assert len(g["skins"][0]["joints"]) == 24

    # The avatar animates.
    from tpubody.mesh import rigging
    frames = np.asarray(rigging.animate(
        out.avatar, np.zeros((2, 24, 3)), np.zeros((2, 3))))
    assert frames.shape[0] == 2 and np.isfinite(frames).all()


@pytest.mark.slow
def test_full_pipeline_humanoid_grafts_hands(tmp_path, capfd):
    """On the structured capsule humanoid the hand graft must actually
    HAPPEN (no degradation warning): the reconstructed avatar's wrists
    host real section rings and the SMPL donor hands attach.  This is
    the asset-free version of the reference's full main.py +
    Replace_Hands flow."""
    from tpubody.models import humanoid as hum
    from tpubody.render import bodymaps

    H = W = 192
    smplh = hum.humanoid(52, 6890, seed=0)
    smpl = hum.humanoid(24, 6890, seed=0)
    cam_t = np.array([0.0, 0.2, 8.0])
    center = np.array([W / 2, H / 2], np.float64)
    focal = 800.0
    fit = rec.FitResult(
        shape=np.zeros(10), pose=np.zeros(156),
        camera_center=center, camera_rotation=np.eye(3),
        camera_translation=cam_t, camera_fx=focal)

    # The "photo" mask is the humanoid's own rendered silhouette — the
    # warp is then near-identity and the depth meshes keep real arms.
    maps = bodymaps.render_body_maps(
        np.asarray(smplh.v_template), np.asarray(smplh.faces),
        np.asarray(smpl.weights)[: np.asarray(smplh.v_template).shape[0]],
        cam_t, center, H, W, focal=focal)
    mask = (np.asarray(maps.mask) > 0).astype(np.uint8) * 255
    front_rgb = np.tile(np.array([180, 120, 90], np.uint8), (H, W, 1))
    back_rgb = np.tile(np.array([90, 120, 180], np.uint8), (H, W, 1))

    out = rec.reconstruct(front_rgb, back_rgb, mask, fit, smplh, smpl,
                          out_dir=str(tmp_path), cache=True,
                          replace_hands=True)
    err = capfd.readouterr().err
    assert "hand replacement skipped" not in err, err
    assert np.isfinite(out.avatar.v_template).all()
    assert (tmp_path / "replace_hands_recover.pkl").exists()


@pytest.mark.slow
def test_full_pipeline_replace_hands_degrades_gracefully(tmp_path, capfd):
    """replace_hands=True on geometry with degenerate wrists (the sphere
    has nothing beyond the wrist planes) warns and keeps the original
    hands instead of crashing mid-pipeline (was: argmin-of-empty)."""
    H = W = 128
    smplh = _sphere_body(52)
    smpl = _sphere_body(24)
    fit = rec.FitResult(
        shape=np.zeros(10), pose=np.zeros(156),
        camera_center=np.array([W / 2, H / 2], np.float64),
        camera_rotation=np.eye(3),
        camera_translation=np.array([0.0, 0.0, 12.0]),
        camera_fx=1000.0)
    yy, xx = np.mgrid[0:H, 0:W]
    mask = ((((xx - W / 2) / 50.0) ** 2 + ((yy - H / 2) / 44.0) ** 2) < 1
            ).astype(np.uint8) * 255
    front_rgb = np.tile(np.array([180, 120, 90], np.uint8), (H, W, 1))
    back_rgb = np.tile(np.array([90, 120, 180], np.uint8), (H, W, 1))

    out = rec.reconstruct(front_rgb, back_rgb, mask, fit, smplh, smpl,
                          out_dir=str(tmp_path), cache=True,
                          replace_hands=True)
    assert np.isfinite(out.avatar.v_template).all()
    assert (tmp_path / "replace_hands_recover.pkl").exists()
    assert "hand replacement skipped" in capfd.readouterr().err


@pytest.mark.slow
def test_pipeline_cache_resume(tmp_path):
    """Second run with identical inputs reuses cached stage artifacts."""
    H = W = 96
    smplh = _sphere_body(52)
    smpl = _sphere_body(24)
    fit = rec.FitResult(
        shape=np.zeros(10), pose=np.zeros(156),
        camera_center=np.array([W / 2, H / 2], np.float64),
        camera_rotation=np.eye(3),
        camera_translation=np.array([0.0, 0.0, 12.0]),
        camera_fx=800.0)
    yy, xx = np.mgrid[0:H, 0:W]
    mask = ((((xx - W / 2) / 38.0) ** 2 + ((yy - H / 2) / 34.0) ** 2) < 1
            ).astype(np.uint8) * 255
    rgb = np.full((H, W, 3), 128, np.uint8)

    from tpubody.utils.profiling import StageTimer
    t1 = StageTimer()
    rec.reconstruct(rgb, rgb, mask, fit, smplh, smpl,
                    out_dir=str(tmp_path), cache=True, timer=t1)
    t2 = StageTimer()
    rec.reconstruct(rgb, rgb, mask, fit, smplh, smpl,
                    out_dir=str(tmp_path), cache=True, timer=t2)

    def sec(t, name):
        return next(r["seconds"] for r in t.records if r["stage"] == name)
    # Cached warp must be much faster than the computed one.
    assert sec(t2, "warp") < max(0.25 * sec(t1, "warp"), 0.05)


def test_fit_pickle_roundtrip(tmp_path):
    fit = rec.FitResult(
        shape=np.arange(10.0), pose=np.arange(156.0),
        camera_center=np.array([512.0, 512.0]),
        camera_rotation=np.eye(3),
        camera_translation=np.array([0.0, 0.1, 40.0]),
        camera_fx=5000.0)
    p = str(tmp_path / "smplh.pkl")
    rec.save_fit_pickle(p, fit)
    loaded = rec.load_fit_pickle(p)
    np.testing.assert_allclose(loaded.shape, fit.shape)
    np.testing.assert_allclose(loaded.pose, fit.pose)
    np.testing.assert_allclose(loaded.camera_translation,
                               fit.camera_translation)
    assert loaded.camera_fx == 5000.0

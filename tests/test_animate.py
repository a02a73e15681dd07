import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.io import motion as motion_lib
from tpubody.mesh import rigging
from tpubody.pipelines import animate as animate_lib
from tpubody.render import video as video_lib
from tpubody.models import params as params_lib


class TestMotionIO:
    def test_amass_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        poses156 = rng.normal(size=(20, 156))
        trans = rng.normal(size=(20, 3))
        p = str(tmp_path / "clip.npz")
        np.savez(p, poses=poses156, trans=trans, mocap_framerate=120.0)
        clip = motion_lib.read_amass(p)
        assert clip.poses.shape == (20, 24, 3)
        flat = clip.poses.reshape(20, 72)
        # Global + 21 body joints pass through; SMPL hand joints 22/23 are
        # ZERO (the reference's [:72] slice would leak finger rotations
        # there — see smplh156_to_smpl24).
        np.testing.assert_allclose(flat[:, :66], poses156[:, :66])
        np.testing.assert_allclose(flat[:, 66:], 0.0)
        np.testing.assert_allclose(clip.trans[0], 0.0)
        assert clip.fps == 120.0

    def test_smpl72_clip_keeps_hand_joints(self, tmp_path):
        """A true SMPL-72 npz has real joints 22/23 — they must survive."""
        rng = np.random.default_rng(3)
        poses72 = rng.normal(size=(5, 72))
        p = str(tmp_path / "clip72.npz")
        np.savez(p, poses=poses72)
        clip = motion_lib.read_amass(p)
        np.testing.assert_allclose(clip.poses.reshape(5, 72), poses72)

    def test_smplh156_to_smpl24(self):
        pose = np.arange(156, dtype=np.float64)[None]
        out = motion_lib.smplh156_to_smpl24(pose)
        assert out.shape == (1, 24, 3)
        np.testing.assert_allclose(out.reshape(72)[:66], pose[0, :66])
        np.testing.assert_allclose(out[0, 22:], 0.0)
        with np.testing.assert_raises(ValueError):
            motion_lib.smplh156_to_smpl24(np.zeros((2, 10)))

    def test_amass_stride(self, tmp_path):
        p = str(tmp_path / "clip.npz")
        np.savez(p, poses=np.zeros((11, 156)), trans=np.zeros((11, 3)))
        clip = motion_lib.read_amass(p, stride=2)
        assert clip.poses.shape[0] == 6

    def test_mixamo_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        poses = rng.normal(size=(15, 24, 3))
        p = str(tmp_path / "result.pkl")
        motion_lib.save_mixamo(p, poses, fps=24.0)
        clip = motion_lib.read_mixamo(p)
        np.testing.assert_allclose(clip.poses, poses)
        assert clip.fps == 24.0


def _sphere_avatar():
    import tests.test_reconstruct_e2e as e2e
    verts, faces = e2e._sphere()
    rng = np.random.default_rng(2)
    parents = params_lib.SMPL_PARENTS
    joints = np.zeros((24, 3))
    for i in range(1, 24):
        d = rng.normal(size=3); d /= np.linalg.norm(d)
        joints[i] = joints[parents[i]] + d * 0.08
    dist = np.linalg.norm(verts[:, None] - joints[None], axis=-1)
    w = np.exp(-dist / 0.05); w /= w.sum(1, keepdims=True)
    return rigging.RiggedAvatar(
        v_template=verts, weights=w,
        color=np.full_like(verts, 0.6),
        faces=faces, joints=joints, parents=tuple(parents),
        or_pose=np.zeros((24, 3)), or_shape=np.zeros(10))


class TestFrameRender:
    def test_render_frame_shape_and_background(self):
        av = _sphere_avatar()
        bg = np.zeros((128, 128, 3), np.float32)
        img = np.asarray(video_lib.render_frame(
            jnp.asarray(av.v_template, jnp.float32),
            jnp.asarray(av.faces), jnp.asarray(av.color, jnp.float32),
            jnp.asarray([0.0, 0.0, 3.0]), jnp.asarray(bg),
            height=128, width=128, focal=300.0, window=64))
        assert img.shape == (128, 128, 3)
        assert img[0, 0].max() == 0.0         # background kept
        assert img.max() > 0.1                # body visible

    def test_batch_matches_single(self):
        av = _sphere_avatar()
        bg = jnp.ones((64, 64, 3), jnp.float32)
        v = jnp.asarray(np.stack([av.v_template, av.v_template * 1.01]),
                        jnp.float32)
        batch = np.asarray(video_lib.render_frames(
            v, jnp.asarray(av.faces), jnp.asarray(av.color, jnp.float32),
            jnp.asarray([0.0, 0.0, 3.0]), bg,
            height=64, width=64, focal=150.0, window=64))
        single = np.asarray(video_lib.render_frame(
            v[0], jnp.asarray(av.faces), jnp.asarray(av.color, jnp.float32),
            jnp.asarray([0.0, 0.0, 3.0]), bg,
            height=64, width=64, focal=150.0, window=64))
        np.testing.assert_allclose(batch[0], single, atol=1e-6)


@pytest.mark.slow
class TestAnimatePipeline:
    def test_animate_video_writes_mp4(self, tmp_path):
        av = _sphere_avatar()
        rng = np.random.default_rng(3)
        clip = motion_lib.MotionClip(
            poses=rng.normal(scale=0.05, size=(6, 24, 3)),
            trans=np.zeros((6, 3)), fps=30.0)
        out = str(tmp_path / "out.mp4")
        animate_lib.animate_video(
            av, clip, out, size=64, focal=150.0,
            cam_t=np.array([0.0, 0.0, 3.0]), chunk=4)
        assert os.path.exists(out)
        assert os.path.getsize(out) > 500

    def test_animate_from_files(self, tmp_path):
        av = _sphere_avatar()
        avp = str(tmp_path / "avatar.pkl")
        rigging.save_avatar(avp, av)
        clipp = str(tmp_path / "result.pkl")
        motion_lib.save_mixamo(
            clipp, np.zeros((4, 24, 3)), fps=30.0)
        out = animate_lib.animate_from_mixamo(
            avp, clipp, str(tmp_path / "v.mp4"), size=64, focal=150.0,
            cam_t=np.array([0.0, 0.0, 3.0]), chunk=2)
        assert os.path.exists(out)

    def test_animate_mixamo_batch(self, tmp_path):
        """Batch driver over a data/mixamo-style clip tree
        (model2video_miaxmo.py batch loop parity)."""
        av = _sphere_avatar()
        avp = str(tmp_path / "avatar.pkl")
        rigging.save_avatar(avp, av)
        root = tmp_path / "mixamo"
        for name in ("0007", "0020"):
            d = root / name
            d.mkdir(parents=True)
            motion_lib.save_mixamo(
                str(d / "result.pkl"), np.zeros((3, 24, 3)), fps=30.0)
        (root / "notaclip").mkdir()          # ignored: no result.pkl
        outs = animate_lib.animate_mixamo_batch(
            avp, str(root), str(tmp_path), size=64, focal=150.0,
            cam_t=np.array([0.0, 0.0, 3.0]), chunk=2)
        assert [os.path.basename(o) for o in outs] == \
            ["or_0007.mp4", "or_0020.mp4"]
        assert all(os.path.exists(o) for o in outs)


@pytest.mark.slow
def test_orbit_video(tmp_path):
    av = _sphere_avatar()
    out = str(tmp_path / "orbit.mp4")
    animate_lib.orbit_video(av, out, n_frames=6, size=64, focal=150.0,
                            cam_t=np.array([0.0, 0.0, 3.0]), chunk=3)
    assert os.path.exists(out) and os.path.getsize(out) > 400


def test_auto_window_scales_with_face_size():
    av = _sphere_avatar()
    small = video_lib.auto_window(av.v_template, av.faces,
                                  np.array([0.0, 0.0, 10.0]),
                                  256, 256, focal=300.0)
    big = video_lib.auto_window(av.v_template, av.faces,
                                np.array([0.0, 0.0, 1.5]),
                                1024, 1024, focal=2500.0)
    assert small < big
    assert small % 8 == 0 and 16 <= small <= 256


def test_auto_window_is_safe():
    """Rendering with the auto window matches a generous window exactly."""
    av = _sphere_avatar()
    cam = np.array([0.0, 0.0, 3.0])
    w = video_lib.auto_window(av.v_template, av.faces, cam, 128, 128,
                              focal=150.0)
    bg = jnp.ones((128, 128, 3), jnp.float32)
    args = (jnp.asarray(av.v_template, jnp.float32),
            jnp.asarray(av.faces), jnp.asarray(av.color, jnp.float32),
            jnp.asarray(cam, jnp.float32), bg)
    auto = np.asarray(video_lib.render_frame(
        *args, height=128, width=128, focal=150.0, window=w))
    safe = np.asarray(video_lib.render_frame(
        *args, height=128, width=128, focal=150.0, window=128))
    np.testing.assert_allclose(auto, safe, atol=1e-6)


def test_render_frame_binned_matches_plain():
    av = _sphere_avatar()
    cam = np.array([0.0, 0.0, 3.0])
    size = 96
    # Project to screen once (host) to split faces.
    from tpubody.render.video import _PRE_ROT, _FLIP_YZ
    from tpubody.render import raster as raster_lib
    v = (av.v_template @ _PRE_ROT.T + cam) @ _FLIP_YZ.T
    z = np.maximum(-v[:, 2], 1e-6)
    screen = np.stack([v[:, 0] / z * 150.0 + size / 2,
                       -v[:, 1] / z * 150.0 + size / 2, z], axis=1)
    sf, lf = raster_lib.split_faces_by_extent(screen, av.faces, 16)
    bg = jnp.ones((size, size, 3), jnp.float32)
    plain = np.asarray(video_lib.render_frame(
        jnp.asarray(av.v_template, jnp.float32), jnp.asarray(av.faces),
        jnp.asarray(av.color, jnp.float32), jnp.asarray(cam, jnp.float32),
        bg, height=size, width=size, focal=150.0, window=96))
    binned = np.asarray(video_lib.render_frame_binned(
        jnp.asarray(av.v_template, jnp.float32), jnp.asarray(sf),
        jnp.asarray(lf), jnp.asarray(av.faces),
        jnp.asarray(av.color, jnp.float32), jnp.asarray(cam, jnp.float32),
        bg, height=size, width=size, focal=150.0,
        small_window=16, large_window=96))
    diff = np.abs(plain - binned)
    assert (diff < 1e-4).mean() > 0.999   # identical off tie-broken edges


class TestTiledVideoPath:
    def test_animate_video_tiled_path(self, tmp_path):
        """128x128 frames tile into 8x128 blocks -> the fused Pallas
        renderer path (render_frames_tiled) drives the video."""
        av = _sphere_avatar()
        rng = np.random.default_rng(7)
        clip = motion_lib.MotionClip(
            poses=rng.normal(scale=0.05, size=(5, 24, 3)),
            trans=np.zeros((5, 3)), fps=30.0)
        out = str(tmp_path / "tiled.mp4")
        animate_lib.animate_video(
            av, clip, out, size=128, focal=300.0,
            cam_t=np.array([0.0, 0.0, 3.0]), chunk=4)
        assert os.path.exists(out)
        assert os.path.getsize(out) > 500

    def test_crop_transfer_frames_bit_exact(self, tmp_path, monkeypatch):
        """Crop-transfer (device slices the clip's projected bbox, host
        pastes onto the background canvas) must reproduce the full-frame
        pull exactly — it only changes which bytes cross the host
        boundary, not the image."""
        av = _sphere_avatar()
        rng = np.random.default_rng(11)
        clip = motion_lib.MotionClip(
            poses=rng.normal(scale=0.05, size=(3, 24, 3)),
            trans=np.zeros((3, 3)), fps=30.0)
        frames = {}
        orig_write = video_lib.VideoWriter.write

        def rec_write(self, frame):
            img = np.asarray(frame)
            if img.dtype != np.uint8:
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            frames.setdefault(self.path, []).append(img.copy())
            orig_write(self, frame)

        monkeypatch.setattr(video_lib.VideoWriter, "write", rec_write)
        for crop in (False, True):
            animate_lib.animate_video(
                av, clip, str(tmp_path / f"ct_{crop}.mp4"), size=128,
                focal=300.0, cam_t=np.array([0.0, 0.0, 3.0]), chunk=2,
                crop_transfer=crop, i420_transfer=False)
        a = np.stack(frames[str(tmp_path / "ct_False.mp4")])
        b = np.stack(frames[str(tmp_path / "ct_True.mp4")])
        np.testing.assert_array_equal(a, b)

    def test_i420_transfer_matches_rgb_path(self, tmp_path, monkeypatch):
        """The planar-YUV transfer (device rgb_to_i420 -> host cv2
        I420->BGR) reproduces the uint8-RGB pull up to the 4:2:0 chroma
        subsample the MP4 codec applies anyway: luma-exact to ~1 LSB,
        small bounded chroma error at color edges."""
        import cv2

        av = _sphere_avatar()
        rng = np.random.default_rng(13)
        clip = motion_lib.MotionClip(
            poses=rng.normal(scale=0.05, size=(3, 24, 3)),
            trans=np.zeros((3, 3)), fps=30.0)
        frames = {}
        orig_write = video_lib.VideoWriter.write
        orig_write_i420 = video_lib.VideoWriter.write_i420

        def rec_write(self, frame):
            frames.setdefault(self.path, []).append(
                video_lib.quantize_u8(frame).copy())
            orig_write(self, frame)

        def rec_write_i420(self, planes):
            rgb = cv2.cvtColor(np.ascontiguousarray(np.asarray(planes)),
                               cv2.COLOR_YUV2RGB_I420)
            frames.setdefault(self.path, []).append(rgb)
            orig_write_i420(self, planes)

        monkeypatch.setattr(video_lib.VideoWriter, "write", rec_write)
        monkeypatch.setattr(video_lib.VideoWriter, "write_i420",
                            rec_write_i420)
        for mode in (False, True):
            animate_lib.animate_video(
                av, clip, str(tmp_path / f"i420_{mode}.mp4"), size=128,
                focal=300.0, cam_t=np.array([0.0, 0.0, 3.0]), chunk=2,
                crop_transfer=False, i420_transfer=mode)
        a = np.stack(frames[str(tmp_path / "i420_False.mp4")]).astype(int)
        b = np.stack(frames[str(tmp_path / "i420_True.mp4")]).astype(int)
        assert a.shape == b.shape
        delta = np.abs(a - b)
        assert delta.mean() < 2.0
        # Luma round-trips almost exactly; only chroma edges can deviate.
        lum_a = a @ [0.299, 0.587, 0.114]
        lum_b = b @ [0.299, 0.587, 0.114]
        assert np.abs(lum_a - lum_b).mean() < 1.5

    @pytest.mark.slow  # compile-heavy; fast-suite budget
    def test_gouraud_shading_close_to_phong(self):
        """Vertex-shaded (gouraud) tiled renders track the per-pixel
        (phong) default closely even on the coarse sphere avatar — on
        production ~2 px triangles they are indistinguishable; the video
        path uses gouraud to halve the kernel's attribute channels."""
        import jax.numpy as jnp

        av = _sphere_avatar()
        verts = np.asarray(rigging.animate(
            av, np.zeros((1, 24, 3)), np.zeros((1, 3))))
        size, focal = 128, 300.0
        plan = video_lib.plan_tiled_render(
            av.v_template, av.faces, np.array([0.0, 0.0, 3.0]),
            size, size, focal)
        lb = tuple(jnp.asarray(b) for b in plan["large_buckets"]) or None
        lad = tuple(jnp.asarray(b) for b in plan["ladder_faces"])
        kw = dict(height=size, width=size, focal=focal,
                  max_chunks=plan["max_chunks"], span_x=plan["span_x"],
                  span_y=plan["span_y"],
                  large_windows=plan["large_windows"],
                  ladder_faces=lad, ladder_specs=plan["ladder_specs"],
                  to_uint8=False)
        args = (jnp.asarray(verts, jnp.float32),
                jnp.asarray(plan["small_faces"]), lb,
                jnp.asarray(av.faces, jnp.int32),
                jnp.asarray(np.asarray(av.color), jnp.float32),
                jnp.asarray([0.0, 0.0, 3.0], jnp.float32),
                jnp.ones((size, size, 3), jnp.float32))
        ph = np.asarray(video_lib.render_frames_tiled(*args, **kw))[0]
        go = np.asarray(video_lib.render_frames_tiled(
            *args, shading="gouraud", **kw))[0]
        assert ph.shape == go.shape
        # Same coverage, close values (vertex vs pixel interpolation of
        # the same Lambert term).
        assert np.abs(ph - go).mean() < 0.02
        assert (np.abs(ph - go) < 0.25).mean() > 0.99

    def test_rgb_to_i420_roundtrip_cv2(self):
        """rgb_to_i420 inverts through cv2.COLOR_YUV2RGB_I420 to ~1 LSB
        on chroma-constant 2x2 blocks (the lossless case)."""
        import cv2
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        # Piecewise-constant 2x2 blocks -> chroma subsampling is exact.
        small = rng.uniform(0, 1, size=(2, 3, 16, 16)).astype(np.float32)
        img = np.repeat(np.repeat(small, 2, axis=2), 2, axis=3)
        planes = np.asarray(video_lib.rgb_to_i420(jnp.asarray(img)))
        assert planes.shape == (2, 48, 32) and planes.dtype == np.uint8
        for i in range(2):
            back = cv2.cvtColor(planes[i], cv2.COLOR_YUV2RGB_I420)
            ref = (img[i].transpose(1, 2, 0) * 255 + 0.5).astype(int)
            assert np.abs(back.astype(int) - ref).max() <= 3

    @pytest.mark.slow  # compile-heavy; fast-suite budget
    def test_orbit_video_tiled_path(self, tmp_path):
        """Tile-aligned orbit renders go through the tiled branch (plan +
        bucketed large faces), not the fragment renderer."""
        av = _sphere_avatar()
        out = str(tmp_path / "orbit_tiled.mp4")
        animate_lib.orbit_video(av, out, n_frames=4, size=128, focal=300.0,
                                cam_t=np.array([0.0, 0.0, 3.0]), chunk=2)
        assert os.path.exists(out) and os.path.getsize(out) > 400

    @pytest.mark.slow  # compile-heavy; fast-suite budget
    def test_many_large_faces_bucket_bounded(self, monkeypatch):
        """A mesh whose faces mostly exceed the tile span splits into
        memory-bounded fragment buckets (was: one 41 GB rasterize call on
        the test03 reconstruction) and still composites correctly."""
        from tpubody.render import video as video_lib
        import jax.numpy as jnp
        # force bucket splitting at tiny sizes
        monkeypatch.setattr(video_lib, "FRAG_BUDGET", 3 * 72 * 72)
        rng = np.random.default_rng(0)
        # 12 big triangles (~80px) in front of a small-face sphere
        av = _sphere_avatar()
        size, focal = 128, 300.0
        # screen-plane here is world x-z; depth is cam_z - y, so y=0.6
        # puts the occluders nearer than the whole sphere.
        big_pts = []
        big_faces = []
        base = av.v_template.shape[0]
        for i in range(12):
            c = rng.uniform(-0.2, 0.0, 2)
            big_pts += [[c[0], 0.6, c[1]], [c[0] + 0.5, 0.6, c[1]],
                        [c[0], 0.6, c[1] + 0.5]]
            big_faces.append([base + 3 * i, base + 3 * i + 1,
                              base + 3 * i + 2])
        verts = np.concatenate([av.v_template, np.asarray(big_pts)])
        faces = np.concatenate([av.faces, np.asarray(big_faces, np.int64)])
        colors = np.concatenate(
            [av.color, np.tile([[1.0, 0.0, 0.0]], (36, 1))])
        # ladder_bounds=() forces every over-span face onto the fragment
        # path — this test pins the fragment-bucket memory bounding.
        plan = video_lib.plan_tiled_render(
            verts, faces, np.array([0.0, 0.0, 3.0]), size, size, focal,
            ladder_bounds=())
        assert len(plan["large_buckets"]) >= 2      # split, not one call
        assert all(b.shape[0] * w * w <= 4 * video_lib.FRAG_BUDGET
                   for b, w in zip(plan["large_buckets"],
                                   plan["large_windows"]))
        lb = tuple(jnp.asarray(b) for b in plan["large_buckets"])
        img = np.asarray(video_lib.render_frames_tiled(
            jnp.asarray(verts[None], jnp.float32),
            jnp.asarray(plan["small_faces"]), lb,
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(colors, jnp.float32),
            jnp.asarray([0.0, 0.0, 3.0], jnp.float32),
            jnp.ones((size, size, 3), jnp.float32),
            height=size, width=size, focal=focal,
            max_chunks=plan["max_chunks"], span_x=plan["span_x"],
            span_y=plan["span_y"], large_windows=plan["large_windows"],
            to_uint8=False))[0]
        # the red occluders (nearer) won the depth test somewhere
        red = (img[..., 0] > 0.5) & (img[..., 1] < 0.3)
        assert red.sum() > 100

    @pytest.mark.slow  # compile-heavy; fast-suite budget
    def test_span_ladder_renders_midsize_faces_tiled(self):
        """Faces past the base span budget but under the ladder top ride
        additional tiled Pallas passes (wider spans), NOT the fragment
        path — and composite to the same image the fragment renderer
        produces.  (Production reconstructed avatars have ~42k such
        faces; the fragment path there cost GBs of transients.)"""
        from tpubody.render import video as video_lib
        import jax.numpy as jnp
        rng = np.random.default_rng(3)
        size, focal = 128, 300.0
        cam = np.array([0.0, 0.0, 3.0])
        # Mid-size triangles (~60-150 px projected) + a tiny one so the
        # small class is non-empty.
        pts, faces = [], []
        for i in range(20):
            c = rng.uniform(-0.6, 0.3, 2)
            s = rng.uniform(0.45, 1.1)
            pts += [[c[0], rng.uniform(-0.2, 0.2), c[1]],
                    [c[0] + s, 0.0, c[1]], [c[0], 0.0, c[1] + s]]
            faces.append([3 * i, 3 * i + 1, 3 * i + 2])
        pts += [[0.0, -1.0, 0.0], [0.03, -1.0, 0.0], [0.0, -1.0, 0.03]]
        faces.append([60, 61, 62])
        verts = np.asarray(pts)
        faces = np.asarray(faces, np.int64)
        colors = np.tile([[0.2, 0.5, 0.9]], (verts.shape[0], 1))
        plan = video_lib.plan_tiled_render(verts, faces, cam, size, size,
                                           focal)
        n_ladder = sum(b.shape[0] for b in plan["ladder_faces"])
        assert n_ladder >= 15, "mid-size faces must enter the span ladder"
        assert not plan["large_buckets"], \
            "no fragment fallback for faces under the ladder top"
        assert len(plan["ladder_faces"]) == len(plan["ladder_specs"])
        vj = jnp.asarray(verts[None], jnp.float32)
        fj = jnp.asarray(faces, jnp.int32)
        cj = jnp.asarray(colors, jnp.float32)
        camj = jnp.asarray(cam, jnp.float32)
        bg = jnp.ones((size, size, 3), jnp.float32)
        lad = tuple(jnp.asarray(b) for b in plan["ladder_faces"])
        tiled = np.asarray(video_lib.render_frames_tiled(
            vj, jnp.asarray(plan["small_faces"]), None, fj, cj, camj, bg,
            height=size, width=size, focal=focal,
            max_chunks=plan["max_chunks"], span_x=plan["span_x"],
            span_y=plan["span_y"], ladder_faces=lad,
            ladder_specs=plan["ladder_specs"], to_uint8=False))[0]
        w = video_lib.auto_window(verts, faces, cam, size, size, focal)
        frag = np.asarray(video_lib.render_frames(
            vj, fj, cj, camj, bg, height=size, width=size, focal=focal,
            window=w))[0]
        agree = np.isclose(tiled, frag, atol=2e-2).mean()
        assert agree > 0.995, agree

    @pytest.mark.slow  # compile-heavy; fast-suite budget
    def test_giant_face_beyond_512px_still_renders(self):
        """A face whose projected extent exceeds the old 512 px window cap
        renders through the frame-sized catch-all bucket instead of being
        silently clipped."""
        from tpubody.render import video as video_lib
        import jax.numpy as jnp
        size, focal = 128, 300.0
        # One giant near triangle covering most of the frame (projected
        # extent far over any ladder bucket) + a tiny far one so the
        # small class is non-empty.
        verts = np.array([
            [-4.0, 1.0, -4.0], [4.0, 1.0, -4.0], [0.0, 1.0, 6.0],   # giant
            [0.0, -1.0, 0.0], [0.05, -1.0, 0.0], [0.0, -1.0, 0.05],  # tiny
        ])
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
        colors = np.tile([[0.0, 1.0, 0.0]], (6, 1))
        cam = np.array([0.0, 0.0, 3.0])
        plan = video_lib.plan_tiled_render(verts, faces, cam, size, size,
                                           focal)
        assert plan["large_buckets"], "giant face must enter a bucket"
        assert max(plan["large_windows"]) == size  # frame-sized catch-all
        lb = tuple(jnp.asarray(b) for b in plan["large_buckets"])
        img = np.asarray(video_lib.render_frames_tiled(
            jnp.asarray(verts[None], jnp.float32),
            jnp.asarray(plan["small_faces"]), lb,
            jnp.asarray(faces, jnp.int32),
            jnp.asarray(colors, jnp.float32),
            jnp.asarray(cam, jnp.float32),
            jnp.zeros((size, size, 3), jnp.float32),
            height=size, width=size, focal=focal,
            max_chunks=plan["max_chunks"], span_x=plan["span_x"],
            span_y=plan["span_y"], large_windows=plan["large_windows"],
            to_uint8=False))[0]
        # The giant face actually covers the frame center.
        assert img[size // 2, size // 2, 1] > 0.2

    def test_tiled_matches_fragment_renderer(self):
        """Same avatar/pose through render_frames_tiled and the fragment
        render_frames must produce (nearly) the same image."""
        from tpubody.render import video as video_lib
        import jax.numpy as jnp
        av = _sphere_avatar()
        verts = np.asarray(rigging.animate(
            av, np.zeros((1, 24, 3)), np.zeros((1, 3))))
        size, focal = 128, 300.0
        cam = jnp.asarray([0.0, 0.0, 3.0], jnp.float32)
        colors = jnp.asarray(np.asarray(av.color) / 1.0, jnp.float32)
        bg = jnp.ones((size, size, 3), jnp.float32)
        vj = jnp.asarray(verts, jnp.float32)
        fj = jnp.asarray(av.faces, jnp.int32)
        plan = video_lib.plan_tiled_render(
            av.v_template, av.faces, np.array([0.0, 0.0, 3.0]),
            size, size, focal)
        lb = tuple(jnp.asarray(b) for b in plan["large_buckets"]) or None
        lad = tuple(jnp.asarray(b) for b in plan["ladder_faces"])
        tiled = np.asarray(video_lib.render_frames_tiled(
            vj, jnp.asarray(plan["small_faces"]), lb, fj, colors, cam, bg,
            height=size, width=size, focal=focal,
            max_chunks=plan["max_chunks"], span_x=plan["span_x"],
            span_y=plan["span_y"], large_windows=plan["large_windows"],
            ladder_faces=lad, ladder_specs=plan["ladder_specs"],
            to_uint8=False))[0]
        w = video_lib.auto_window(av.v_template, av.faces,
                                  np.array([0.0, 0.0, 3.0]), size, size,
                                  focal)
        frag = np.asarray(video_lib.render_frames(
            vj, fj, colors, cam, bg, height=size, width=size,
            focal=focal, window=w))[0]
        # same light/shading model; differences only at sub-pixel edges
        agree = np.isclose(tiled, frag, atol=2e-2).mean()
        assert agree > 0.995, agree


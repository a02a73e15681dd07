"""ASF/AMC parsing, FK and SMPL retargeting (reference utils/skeleton.py)."""
import numpy as np
import pytest

from tpubody.io import asf as asf_lib


SAMPLE_ASF = """
:version 1.10
:name VICON
:units
  mass 1.0
  length 0.45
  angle deg
:documentation
  test skeleton
:root
  order TX TY TZ RX RY RZ
  axis XYZ
  position 0 0 0
  orientation 0 0 0
:bonedata
  begin
     id 1
     name lfemur
     direction 0.34 -0.93 0
     length 7.0
     axis 0 0 20 XYZ
    dof rx ry rz
    limits (-160.0 20.0)
           (-70.0 70.0)
           (-60.0 70.0)
  end
  begin
     id 2
     name ltibia
     direction 0.34 -0.94 0
     length 7.3
     axis 0 0 20 XYZ
    dof rx
    limits (-10.0 170.0)
  end
  begin
     id 3
     name upperback
     direction 0.0 1.0 0.0
     length 2.0
     axis 0 0 0 XYZ
  end
:hierarchy
  begin
    root lfemur upperback
    lfemur ltibia
  end
"""

SAMPLE_AMC = """
#!OML:ASF
:FULLY-SPECIFIED
:DEGREES
1
root 1.0 16.0 -2.0 10.0 -5.0 3.0
lfemur 20.0 -8.0 5.0
ltibia 30.0
2
root 1.5 16.2 -2.1 11.0 -5.5 3.5
lfemur 22.0 -9.0 6.0
ltibia 35.0
"""


def _euler_xyz(ax, ay, az):
    """Independent scalar oracle: static x-then-y-then-z rotations."""
    Rx = np.array([[1, 0, 0],
                   [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)],
                   [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]])
    Rz = np.array([[np.cos(az), -np.sin(az), 0],
                   [np.sin(az), np.cos(az), 0],
                   [0, 0, 1]])
    return Rz @ Ry @ Rx


def _fk_oracle(skel, frame):
    """Recursive per-frame FK with the reference's Joint semantics
    (utils/skeleton.py:112-132), written scalar for independence."""
    coords = {}
    mats = {}
    scale = skel.length_scale
    for bone in skel.bones:
        vals = frame.get(bone.name)
        if bone.name == "root":
            coords[0] = np.asarray(vals[:3]) * scale
            rot = np.deg2rad(vals[3:6])
            mats[0] = bone.C @ _euler_xyz(*rot) @ bone.Cinv
            continue
        rotation = np.zeros(3)
        idx = 0
        for axis in range(3):
            if not np.array_equal(bone.limits[axis], np.zeros(2)):
                rotation[axis] = vals[idx] if vals is not None else 0.0
                idx += 1
        rotation = np.deg2rad(rotation)
        rel = bone.C @ _euler_xyz(*rotation) @ bone.Cinv
        bi = skel.name_to_index[bone.name]
        mats[bi] = mats[bone.parent] @ rel
        coords[bi] = (coords[bone.parent]
                      + bone.length * scale * (mats[bi] @ bone.direction))
    return coords, mats


class TestParse:
    def test_orphan_bone_raises(self):
        """A bone declared in :bonedata but absent from :hierarchy must be
        a parse error, not an infinite reorder loop."""
        broken = SAMPLE_ASF.replace("    lfemur ltibia\n", "")
        with pytest.raises(ValueError, match="ltibia"):
            asf_lib.parse_asf(broken)

    def test_parse_asf_structure(self):
        skel = asf_lib.parse_asf(SAMPLE_ASF)
        assert sorted(b.name for b in skel.bones) == [
            "lfemur", "ltibia", "root", "upperback"]
        # parents precede children in bone order
        for i, b in enumerate(skel.bones):
            assert b.parent < i
        lf = skel.bones[skel.index("lfemur")]
        assert lf.parent == skel.index("root")
        assert lf.dof == ("rx", "ry", "rz")
        assert lf.limits[0, 0] == -160.0 and lf.limits[2, 1] == 70.0
        lt = skel.bones[skel.index("ltibia")]
        assert lt.parent == skel.index("lfemur")
        assert lt.dof == ("rx",)
        # fixed bone: no dof, identity-limit rows
        ub = skel.bones[skel.index("upperback")]
        assert ub.dof == ()
        # axis 20deg about z -> C rotates x toward y
        np.testing.assert_allclose(
            lf.C @ lf.Cinv, np.eye(3), atol=1e-12)
        assert lf.C[1, 0] > 0.3

    def test_parse_amc_frames(self):
        frames = asf_lib.parse_amc(SAMPLE_AMC)
        assert len(frames) == 2
        assert frames[0]["root"].shape == (6,)
        np.testing.assert_allclose(frames[1]["ltibia"], [35.0])


class TestFK:
    def test_fk_matches_recursive_oracle(self):
        skel = asf_lib.parse_asf(SAMPLE_ASF)
        frames = asf_lib.parse_amc(SAMPLE_AMC)
        coords, glob, rel = asf_lib.fk(skel, frames)
        assert coords.shape == (2, 4, 3)
        for f, frame in enumerate(frames):
            oc, om = _fk_oracle(skel, frame)
            for bi in range(4):
                np.testing.assert_allclose(coords[f, bi], oc[bi], atol=1e-10)
                np.testing.assert_allclose(glob[f, bi], om[bi], atol=1e-10)

    def test_rotations_are_orthonormal(self):
        skel = asf_lib.parse_asf(SAMPLE_ASF)
        frames = asf_lib.parse_amc(SAMPLE_AMC)
        _, glob, rel = asf_lib.fk(skel, frames)
        eye = np.broadcast_to(np.eye(3), glob.shape)
        np.testing.assert_allclose(
            glob @ np.swapaxes(glob, -1, -2), eye, atol=1e-10)
        np.testing.assert_allclose(
            rel @ np.swapaxes(rel, -1, -2), eye, atol=1e-10)


class TestRetarget:
    def test_zero_motion_gives_identity_poses(self):
        skel = asf_lib.parse_asf(SAMPLE_ASF)
        frames = [{
            "root": np.zeros(6),
            "lfemur": np.zeros(3),
            "ltibia": np.zeros(1),
        }]
        clip = asf_lib.retarget_to_smpl(skel, frames)
        np.testing.assert_allclose(clip.poses, 0.0, atol=1e-12)
        np.testing.assert_allclose(clip.trans, 0.0, atol=1e-12)

    def test_mapped_joints_carry_rotation(self):
        skel = asf_lib.parse_asf(SAMPLE_ASF)
        frames = asf_lib.parse_amc(SAMPLE_AMC)
        clip = asf_lib.retarget_to_smpl(skel, frames, fps=60.0)
        assert clip.poses.shape == (2, 24, 3)
        assert clip.fps == 60.0
        # lfemur -> SMPL joint 1, ltibia -> 4, upperback -> 3 (zero dof)
        assert np.linalg.norm(clip.poses[0, 1]) > 0.1
        assert np.linalg.norm(clip.poses[0, 4]) > 0.1
        np.testing.assert_allclose(clip.poses[:, 3], 0.0, atol=1e-12)
        # unmapped joints stay identity
        np.testing.assert_allclose(clip.poses[:, 20], 0.0, atol=1e-12)
        # ltibia has a single rx dof: axis-angle should be x-dominant in
        # the conjugated frame; magnitude matches the 30deg input
        angle = np.linalg.norm(clip.poses[0, 4])
        np.testing.assert_allclose(angle, np.deg2rad(30.0), atol=1e-8)
        # trans is first-frame normalized
        np.testing.assert_allclose(clip.trans[0], 0.0, atol=1e-12)

    def test_read_amc_roundtrip(self, tmp_path):
        asf_p = tmp_path / "skel.asf"
        amc_p = tmp_path / "clip.amc"
        asf_p.write_text(SAMPLE_ASF)
        amc_p.write_text(SAMPLE_AMC)
        clip = asf_lib.read_amc(str(asf_p), str(amc_p), fps=120.0, stride=1)
        assert clip.poses.shape == (2, 24, 3)
        assert np.all(np.isfinite(clip.poses))
        assert np.all(np.isfinite(clip.trans))


def test_clip_drives_lbs_forward():
    """Retargeted poses run through the batched SMPL forward."""
    from tpubody.models import params as params_lib
    from tpubody.models import smpl as smpl_lib

    skel = asf_lib.parse_asf(SAMPLE_ASF)
    frames = asf_lib.parse_amc(SAMPLE_AMC)
    clip = asf_lib.retarget_to_smpl(skel, frames)
    body = params_lib.synthetic(n_joints=24, n_verts=128, seed=0)
    verts = smpl_lib.forward_batch_verts(
        body, np.asarray(clip.poses, np.float32),
        np.zeros(10, np.float32), None)
    assert verts.shape == (2, 128, 3)
    assert np.all(np.isfinite(np.asarray(verts)))


class TestChannelMapping:
    def test_dof_without_limits_parses_channels(self):
        """A bone declaring dof but no limits (legal ASF) must still map
        its AMC values onto the declared axes."""
        asf = SAMPLE_ASF.replace(
            "    dof rx\n    limits (-10.0 170.0)\n", "    dof rx rz\n")
        skel = asf_lib.parse_asf(asf)
        amc = asf_lib.parse_amc(SAMPLE_AMC.replace(
            "ltibia 30.0", "ltibia 30.0 15.0").replace(
            "ltibia 35.0", "ltibia 35.0 17.0"))
        angles, _ = asf_lib._frame_angles(skel, amc)
        bi = skel.name_to_index["ltibia"]
        np.testing.assert_allclose(
            angles[0, bi], np.deg2rad([30.0, 0.0, 15.0]), atol=1e-12)

    def test_root_order_honored(self):
        """Non-standard :root order permutes the AMC root channels."""
        asf = SAMPLE_ASF.replace("order TX TY TZ RX RY RZ",
                                 "order RZ RY RX TZ TY TX")
        skel = asf_lib.parse_asf(asf)
        amc = asf_lib.parse_amc(SAMPLE_AMC)
        angles, root_t = asf_lib._frame_angles(skel, amc)
        # frame 0 root values: 1.0 16.0 -2.0 10.0 -5.0 3.0
        np.testing.assert_allclose(root_t[0], [3.0, -5.0, 10.0])
        np.testing.assert_allclose(
            angles[0, 0], np.deg2rad([-2.0, 16.0, 1.0]), atol=1e-12)

    def test_unsupported_root_order_raises(self):
        asf = SAMPLE_ASF.replace("order TX TY TZ RX RY RZ",
                                 "order TX TY TZ RX RY L")
        with pytest.raises(ValueError, match="root order"):
            asf_lib.parse_asf(asf)

    def test_radians_amc_not_converted(self):
        amc_rad = SAMPLE_AMC.replace(":DEGREES", ":RADIANS")
        skel = asf_lib.parse_asf(SAMPLE_ASF)
        deg = asf_lib.parse_amc(SAMPLE_AMC)
        rad = asf_lib.parse_amc(amc_rad)
        assert deg.degrees and not rad.degrees
        a_deg, _ = asf_lib._frame_angles(skel, deg)
        a_rad, _ = asf_lib._frame_angles(skel, rad)
        bi = skel.name_to_index["lfemur"]
        np.testing.assert_allclose(a_deg[0, bi],
                                   np.deg2rad(a_rad[0, bi]), atol=1e-12)

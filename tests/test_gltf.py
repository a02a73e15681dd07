"""GLB export: structural validity + exact skinning parity.

The skinned-avatar test re-evaluates the exported file with an independent
numpy glTF 2.0 interpreter (node TRS composition, inverseBindMatrices,
JOINTS_n/WEIGHTS_n sets) and pins it against ``rigging.animate`` — the glTF
skinning model must reproduce the framework's SMPL LBS frame-for-frame.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpubody.mesh import gltf as gltf_lib
from tpubody.mesh import rigging as rigging_lib
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib


def _quat_xyzw_to_mat(q):
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _eval_skinned_gltf(gltf, blob, frame):
    """Independent glTF skinning evaluator: returns (V, 3) world vertices
    for animation sample ``frame`` (exact sampler inputs, no interpolation)."""
    acc = lambda i: gltf_lib.read_accessor(gltf, blob, i)
    nodes = gltf["nodes"]

    # Per-node local TRS at this frame (animation overrides node statics).
    trans = {i: np.asarray(n.get("translation", [0, 0, 0]), np.float64)
             for i, n in enumerate(nodes)}
    rot = {i: np.array([0, 0, 0, 1.0]) for i in range(len(nodes))}
    for anim in gltf.get("animations", []):
        for ch in anim["channels"]:
            s = anim["samplers"][ch["sampler"]]
            out = acc(s["output"])
            node = ch["target"]["node"]
            if ch["target"]["path"] == "rotation":
                rot[node] = np.asarray(out[frame], np.float64)
            elif ch["target"]["path"] == "translation":
                trans[node] = np.asarray(out[frame], np.float64)

    local = {}
    for i in range(len(nodes)):
        m = np.eye(4)
        m[:3, :3] = _quat_xyzw_to_mat(rot[i])
        m[:3, 3] = trans[i]
        local[i] = m

    # Parent map from children lists; roots = scene nodes.
    parent = {}
    for i, n in enumerate(nodes):
        for c in n.get("children", []):
            parent[c] = i

    glob = {}

    def global_of(i):
        if i not in glob:
            glob[i] = (global_of(parent[i]) @ local[i]
                       if i in parent else local[i])
        return glob[i]

    skin = gltf["skins"][0]
    # MAT4 accessors are column-major: numpy row-major view is the transpose.
    ibm = acc(skin["inverseBindMatrices"])
    joint_nodes = skin["joints"]
    S = np.stack([global_of(joint_nodes[j]) @ ibm[j].T
                  for j in range(len(joint_nodes))])

    prim = gltf["meshes"][0]["primitives"][0]
    pos = acc(prim["attributes"]["POSITION"]).astype(np.float64)
    V = pos.shape[0]
    blended = np.zeros((V, 4, 4))
    i = 0
    while f"JOINTS_{i}" in prim["attributes"]:
        jn = acc(prim["attributes"][f"JOINTS_{i}"]).astype(np.int64)
        wt = acc(prim["attributes"][f"WEIGHTS_{i}"]).astype(np.float64)
        blended += np.einsum("vk,vkab->vab", wt, S[jn])
        i += 1
    hom = np.concatenate([pos, np.ones((V, 1))], axis=1)
    out = np.einsum("vab,vb->va", blended, hom)
    return out[:, :3]


def _synthetic_avatar(seed=0, n_verts=300):
    model = params_lib.synthetic(n_joints=24, n_verts=n_verts, seed=seed)
    rest = smpl_lib.forward(model, jnp.zeros((24, 3), jnp.float32),
                            jnp.zeros(10))
    rng = np.random.default_rng(seed)
    return rigging_lib.RiggedAvatar(
        v_template=np.asarray(model.v_template, np.float64),
        weights=np.asarray(model.weights, np.float64),
        color=rng.uniform(0, 1, (n_verts, 3)),
        faces=np.asarray(model.faces, np.int64),
        joints=np.asarray(rest.joints_rest, np.float64),
        parents=tuple(model.parents),
        or_pose=np.zeros((24, 3)),
        or_shape=np.zeros(10),
    )


class TestStaticExport:
    def test_roundtrip_positions_indices_colors(self, tmp_path):
        rng = np.random.default_rng(3)
        verts = rng.normal(size=(17, 3)).astype(np.float32)
        faces = rng.integers(0, 17, (9, 3)).astype(np.int64)
        colors = rng.uniform(0, 255, (17, 3))
        p = str(tmp_path / "m.glb")
        gltf_lib.export_glb(p, verts, faces, colors)
        gltf, blob = gltf_lib.read_glb(p)
        assert gltf["asset"]["version"] == "2.0"
        prim = gltf["meshes"][0]["primitives"][0]
        pos = gltf_lib.read_accessor(gltf, blob, prim["attributes"]["POSITION"])
        np.testing.assert_allclose(pos, verts, atol=1e-7)
        idx = gltf_lib.read_accessor(gltf, blob, prim["indices"])
        np.testing.assert_array_equal(idx.reshape(-1, 3), faces)
        col = gltf_lib.read_accessor(gltf, blob, prim["attributes"]["COLOR_0"])
        np.testing.assert_allclose(col, colors / 255.0, atol=1e-6)
        # POSITION accessor must carry min/max (glTF spec requirement).
        acc = gltf["accessors"][prim["attributes"]["POSITION"]]
        np.testing.assert_allclose(acc["min"], verts.min(axis=0), rtol=1e-6)

    def test_alignment_and_length(self, tmp_path):
        p = str(tmp_path / "m.glb")
        gltf_lib.export_glb(p, np.zeros((5, 3)), np.zeros((1, 3), np.int64))
        raw = open(p, "rb").read()
        assert len(raw) % 4 == 0
        gltf, blob = gltf_lib.read_glb(p)
        for view in gltf["bufferViews"]:
            assert view["byteOffset"] % 4 == 0
        assert gltf["buffers"][0]["byteLength"] == len(blob.rstrip(b"\0")) or \
            gltf["buffers"][0]["byteLength"] <= len(blob)


class TestSkinnedExport:
    def test_rest_pose_equals_template(self, tmp_path):
        avatar = _synthetic_avatar()
        p = str(tmp_path / "a.glb")
        gltf_lib.export_avatar_glb(
            p, avatar, poses=np.zeros((1, 24, 3)),
            max_influences=avatar.weights.shape[1])
        gltf, blob = gltf_lib.read_glb(p)
        out = _eval_skinned_gltf(gltf, blob, 0)
        np.testing.assert_allclose(out, avatar.v_template, atol=1e-5)

    def test_animation_matches_rigging_animate(self, tmp_path):
        avatar = _synthetic_avatar(seed=1)
        rng = np.random.default_rng(7)
        poses = rng.normal(scale=0.4, size=(3, 24, 3))
        trans = rng.normal(scale=0.2, size=(3, 3))
        expect = np.asarray(rigging_lib.animate(avatar, poses, trans))

        p = str(tmp_path / "a.glb")
        gltf_lib.export_avatar_glb(
            p, avatar, poses=poses, trans=trans,
            max_influences=avatar.weights.shape[1])
        gltf, blob = gltf_lib.read_glb(p)
        for f in range(3):
            out = _eval_skinned_gltf(gltf, blob, f)
            np.testing.assert_allclose(out, expect[f], atol=2e-5)

    def test_ignored_joints_are_zeroed(self, tmp_path):
        """Exported rotation channels for chest/hand joints are identity
        (rigging.IGNORED_JOINTS semantics, reference
        lib/mesh2smpl_model.py:272-274)."""
        avatar = _synthetic_avatar(seed=2)
        poses = np.full((2, 24, 3), 0.3)
        p = str(tmp_path / "a.glb")
        gltf_lib.export_avatar_glb(p, avatar, poses=poses)
        gltf, blob = gltf_lib.read_glb(p)
        anim = gltf["animations"][0]
        for ch in anim["channels"]:
            if ch["target"]["path"] != "rotation":
                continue
            j = ch["target"]["node"] - 1
            q = gltf_lib.read_accessor(
                gltf, blob, anim["samplers"][ch["sampler"]]["output"])
            if j in rigging_lib.IGNORED_JOINTS:
                np.testing.assert_allclose(q, [[0, 0, 0, 1]] * 2, atol=1e-7)
            else:
                assert abs(q[0, 3]) < 1.0  # actually rotated

    def test_weight_truncation_renormalizes(self):
        w = np.array([[0.5, 0.3, 0.1, 0.05, 0.05] + [0.0] * 19])
        sets = gltf_lib._skin_sets(w, max_influences=4)
        assert len(sets) == 1
        joints, vals = sets[0]
        assert vals.sum() == pytest.approx(1.0, abs=1e-6)
        np.testing.assert_array_equal(joints[0], [0, 1, 2, 3])

    def test_cli_export_glb_with_clip(self, tmp_path):
        from tpubody import cli
        from tpubody.io import motion as motion_lib

        avatar = _synthetic_avatar(seed=3)
        pkl = str(tmp_path / "avatar.pkl")
        rigging_lib.save_avatar(pkl, avatar)
        clip = str(tmp_path / "result.pkl")
        motion_lib.save_mixamo(
            clip, np.random.default_rng(0).normal(scale=0.2, size=(4, 24, 3)),
            fps=24.0)
        out = str(tmp_path / "a.glb")
        assert cli.main(["export-glb", pkl, out, "--clip", clip]) == 0
        gltf, blob = gltf_lib.read_glb(out)
        anim = gltf["animations"][0]
        times = gltf_lib.read_accessor(
            gltf, blob, anim["samplers"][0]["input"])
        assert times.shape == (4,)
        np.testing.assert_allclose(times[1], 1.0 / 24.0, rtol=1e-6)

    def test_skin_structure(self, tmp_path):
        avatar = _synthetic_avatar()
        p = str(tmp_path / "a.glb")
        gltf_lib.export_avatar_glb(p, avatar)
        gltf, blob = gltf_lib.read_glb(p)
        skin = gltf["skins"][0]
        assert len(skin["joints"]) == 24
        ibm = gltf_lib.read_accessor(gltf, blob, skin["inverseBindMatrices"])
        # Column-major translation lives in flat indices 12..14 = row 3.
        np.testing.assert_allclose(ibm[:, 3, :3], -avatar.joints, atol=1e-6)
        # Joint hierarchy mirrors the SMPL kinematic tree.
        for j, par in enumerate(avatar.parents):
            if par >= 0:
                assert 1 + j in gltf["nodes"][1 + par]["children"]

import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.render import raster as raster_lib
from tests.oracle.np_raster import rasterize_np


def _random_mesh(n_verts=40, n_faces=30, size=48, seed=0):
    rng = np.random.default_rng(seed)
    verts = np.zeros((n_verts, 3))
    verts[:, 0] = rng.uniform(2, size - 2, n_verts)
    verts[:, 1] = rng.uniform(2, size - 2, n_verts)
    verts[:, 2] = rng.uniform(0.5, 3.0, n_verts)
    faces = rng.integers(0, n_verts, size=(n_faces, 3)).astype(np.int32)
    attrs = rng.normal(size=(n_verts, 5))
    return verts, faces, attrs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_bruteforce_oracle(seed):
    size = 48
    verts, faces, attrs = _random_mesh(seed=seed, size=size)
    out = raster_lib.rasterize(
        jnp.asarray(verts, jnp.float32), jnp.asarray(faces),
        jnp.asarray(attrs, jnp.float32), size, size, window=size)
    ref_img, ref_depth, ref_mask, ref_fid = rasterize_np(
        verts, faces, attrs, size, size)

    got_mask = np.asarray(out.mask)
    # Coverage must agree except possibly on exact triangle edges.
    disagree = got_mask != ref_mask
    assert disagree.mean() < 0.01, f"coverage mismatch {disagree.mean()}"

    both = got_mask & ref_mask
    # Depth-quantized winner selection: allow tiny attr deviation where two
    # faces are within one quantization step, exact elsewhere.
    same_face = np.asarray(out.face_id) == ref_fid
    agree = both & same_face
    assert (agree.sum() / max(both.sum(), 1)) > 0.98
    np.testing.assert_allclose(
        np.asarray(out.attrs)[agree], ref_img[agree], atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.depth)[agree], ref_depth[agree], atol=1e-3)


def test_single_triangle_interpolation():
    verts = np.array([[4, 4, 1.0], [28, 4, 1.0], [4, 28, 1.0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    attrs = np.array([[1.0], [0.0], [0.0]], np.float32)
    out = raster_lib.rasterize(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs),
        32, 32, window=32)
    m = np.asarray(out.mask)
    assert m[5, 5] and not m[30, 30]
    # Attribute at v0's corner close to 1, decreasing along x.
    a = np.asarray(out.attrs)[..., 0]
    assert a[5, 5] > a[5, 20] > 0.0


def test_depth_ordering_two_triangles():
    # Two overlapping triangles; nearer one (z=1) must win over z=2.
    verts = np.array([
        [2, 2, 1.0], [30, 2, 1.0], [2, 30, 1.0],       # near
        [2, 2, 2.0], [30, 2, 2.0], [30, 30, 2.0],      # far
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    attrs = np.array([[1.0]] * 3 + [[2.0]] * 3, np.float32)
    out = raster_lib.rasterize(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs),
        32, 32, window=32)
    a = np.asarray(out.attrs)[..., 0]
    assert abs(a[4, 8] - 1.0) < 1e-5     # overlap region -> near triangle
    assert abs(a[28, 28] - 2.0) < 1e-5   # far-only region


def test_multichannel_one_pass():
    """24-channel attribute maps interpolate in a single pass
    (vs the reference's 8 RGB passes, utils/render_model.py:101-110)."""
    verts, faces, _ = _random_mesh()
    rng = np.random.default_rng(3)
    attrs = rng.random((verts.shape[0], 24))
    out = raster_lib.rasterize(
        jnp.asarray(verts, jnp.float32), jnp.asarray(faces),
        jnp.asarray(attrs, jnp.float32), 48, 48, window=48)
    assert out.attrs.shape == (48, 48, 24)
    m = np.asarray(out.mask)
    vals = np.asarray(out.attrs)[m]
    assert np.isfinite(vals).all()
    assert (vals >= -1e-4).all() and (vals <= 1.0 + 1e-4).all()


def test_vertex_normals_flat_quad():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    vn = np.asarray(raster_lib.vertex_normals(jnp.asarray(verts), jnp.asarray(faces)))
    np.testing.assert_allclose(np.abs(vn[:, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(vn[:, :2], 0.0, atol=1e-6)


def test_binned_matches_single_pass():
    """Small/large binned rasterization == one conservative-window pass."""
    size = 64
    rng = np.random.default_rng(5)
    # Mix of small and large triangles.
    verts = np.zeros((30, 3))
    verts[:, 0] = rng.uniform(2, size - 2, 30)
    verts[:, 1] = rng.uniform(2, size - 2, 30)
    verts[:, 2] = rng.uniform(0.5, 3.0, 30)
    faces_small = rng.integers(0, 10, size=(12, 3)).astype(np.int32)
    verts[:10, :2] = verts[:10, :2] * 0.1 + 5   # cluster -> small faces
    faces_large = np.asarray([[10, 20, 29], [11, 22, 28]], np.int32)
    faces = np.concatenate([faces_small, faces_large])
    attrs = rng.normal(size=(30, 4))

    vj = jnp.asarray(verts, jnp.float32)
    aj = jnp.asarray(attrs, jnp.float32)
    ref = raster_lib.rasterize(vj, jnp.asarray(faces), aj, size, size,
                               window=size)
    sf, lf = raster_lib.split_faces_by_extent(verts, faces, 16,
                                              pad_multiple=8)
    got = raster_lib.rasterize_binned(
        vj, jnp.asarray(sf), jnp.asarray(lf), aj, size, size,
        small_window=16, large_window=size)
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_allclose(np.asarray(got.depth)[m],
                               np.asarray(ref.depth)[m], atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.attrs)[m],
                               np.asarray(ref.attrs)[m], atol=1e-2)


def test_split_faces_padding():
    verts = np.array([[0, 0, 1], [5, 0, 1], [0, 5, 1],
                      [0, 0, 1], [50, 0, 1], [0, 50, 1]], np.float64)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    sf, lf = raster_lib.split_faces_by_extent(verts, faces, 16,
                                              pad_multiple=4)
    assert sf.shape[0] % 4 == 0 and lf.shape[0] % 4 == 0
    # First rows carry the real faces; padding is degenerate (0,0,0).
    assert (sf[0] == [0, 1, 2]).all()
    assert (lf[0] == [3, 4, 5]).all()
    assert (sf[1:] == 0).all()


def test_offscreen_bbox_anchor_clamped_into_screen():
    """A face whose bbox min lies far offscreen must still rasterize its
    visible part: the window anchor is clamped into the frame (an
    unclamped anchor at x=-700 put the whole 64x64 lattice offscreen)."""
    verts = jnp.asarray([[-700.0, -700.0, 1.0],
                         [900.0, -700.0, 1.0],
                         [100.0, 900.0, 1.0]])
    faces = jnp.asarray([[0, 1, 2]])
    attrs = jnp.ones((3, 1))
    out = raster_lib.rasterize(verts, faces, attrs, 128, 128, window=64)
    mask = np.asarray(out.mask)
    # The clamped 64x64 window covers the top-left screen corner, which is
    # deep inside this giant triangle.
    assert mask[32, 32]
    assert mask[:64, :64].mean() > 0.9

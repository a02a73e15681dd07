"""Fused Pallas LBS kernel vs the XLA reference path.

On the CPU test mesh the kernel runs through the Pallas interpreter
(pallas_call lowers to interpret mode on non-TPU backends via
force_tpu_interpret_mode); numerics must match the XLA path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib

pallas_lbs = pytest.importorskip("tpubody.core.pallas_lbs")


@pytest.fixture(scope="module")
def setup():
    model = params_lib.synthetic(n_joints=24, n_verts=700, seed=2)
    rng = np.random.default_rng(0)
    F = 6
    poses = jnp.asarray(rng.normal(scale=0.3, size=(F, 24, 3)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(10,)), jnp.float32)
    trans = jnp.asarray(rng.normal(size=(F, 3)), jnp.float32)
    return model, poses, beta, trans


def _run_fused(model, poses, beta, trans, kernel_precision="highest"):
    from jax.experimental.pallas import tpu as pltpu
    ctx = (pltpu.force_tpu_interpret_mode()
           if jax.default_backend() != "tpu" else _null())
    with ctx:
        return pallas_lbs.lbs_forward_batch_fused(
            model.v_template, model.shapedirs, model.posedirs,
            model.j_regressor, model.weights, model.parents,
            poses, beta, trans, frame_tile=4, vert_tile=256,
            kernel_precision=kernel_precision)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_fused_matches_xla_path(setup):
    model, poses, beta, trans = setup
    ref = smpl_lib.forward_batch(model, poses, beta, trans).verts
    got = _run_fused(model, poses, beta, trans)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 2e-5, f"fused kernel mismatch {err}"


def test_fused_bf16x3_within_oracle_budget(setup):
    """The throughput default (bf16x3 split matmuls) stays an order of
    magnitude inside the <1e-4 vertex-error budget (measured ~1e-5 on
    chip; the interpreter path reproduces the split arithmetic)."""
    model, poses, beta, trans = setup
    ref = smpl_lib.forward_batch(model, poses, beta, trans).verts
    got = _run_fused(model, poses, beta, trans, kernel_precision="bf16x3")
    scale = float(np.abs(np.asarray(ref)).max())
    err = np.abs(np.asarray(got) - np.asarray(ref)).max() / scale
    assert err < 1e-4, f"bf16x3 kernel outside budget: {err}"


def test_fused_handles_padding(setup):
    """F and V not multiples of the tile sizes."""
    model, poses, beta, trans = setup
    got = _run_fused(model, poses[:5], beta, trans[:5])
    ref = smpl_lib.forward_batch(model, poses[:5], beta, trans[:5]).verts
    assert got.shape == (5, model.num_verts, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_forward_batch_verts_dispatch(setup):
    """CPU fallback path of the public throughput API matches forward_batch."""
    model, poses, beta, trans = setup
    ref = smpl_lib.forward_batch(model, poses, beta, trans).verts
    got = smpl_lib.forward_batch_verts(model, poses, beta, trans,
                                       use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_fused_per_frame_betas(setup):
    """Per-frame betas via the folded shape-blendshape features."""
    model, poses, beta, trans = setup
    rng = np.random.default_rng(7)
    betas_f = jnp.asarray(rng.normal(scale=0.5, size=(poses.shape[0], 10)),
                          jnp.float32)
    ref = smpl_lib.forward_batch(model, poses, betas_f, trans).verts
    from jax.experimental.pallas import tpu as pltpu
    import jax as _jax
    ctx = (pltpu.force_tpu_interpret_mode()
           if _jax.default_backend() != "tpu" else _null())
    with ctx:
        got = pallas_lbs.lbs_forward_batch_fused(
            model.v_template, model.shapedirs, model.posedirs,
            model.j_regressor, model.weights, model.parents,
            poses, betas_f, trans, frame_tile=4, vert_tile=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.models import hmr as hmr_lib


@pytest.fixture(scope="module")
def small_images():
    rng = np.random.default_rng(0)
    # 64^2 keeps the ResNet compile cheap on the 1-core CPU test mesh;
    # HMR is fully convolutional, so shapes/semantics are size-free
    # (224^2 deployment is exercised by bench.py and the slow set).
    return jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)


@pytest.fixture(scope="module")
def model_and_vars():
    # fp32 on CPU test mesh; bf16 is the TPU deployment dtype.
    # shape-init skips the ~25s ResNet-50 init compile; real init is
    # exercised by the slow stem tests and training paths.
    return hmr_lib.create_hmr(dtype=jnp.float32, image_size=64, init="shape")


def test_forward_shapes(model_and_vars, small_images):
    model, variables = model_and_vars
    out = model.apply(variables, small_images)
    assert out.rotmats.shape == (2, 24, 3, 3)
    assert out.shape.shape == (2, 10)
    assert out.cam.shape == (2, 3)
    assert out.pose6d.shape == (2, 144)


def test_rotmats_are_rotations(model_and_vars, small_images):
    model, variables = model_and_vars
    out = model.apply(variables, small_images)
    R = np.asarray(out.rotmats).reshape(-1, 3, 3)
    should_be_eye = R @ np.transpose(R, (0, 2, 1))
    np.testing.assert_allclose(
        should_be_eye, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_ief_starts_from_mean_params(model_and_vars, small_images):
    """With zeroed head weights the IEF loop must return the mean params."""
    model, variables = model_and_vars
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
    # Zero only the decoder heads; backbone untouched.
    params = dict(variables["params"])
    for head in ("decpose", "decshape", "deccam"):
        params[head] = zeroed[head]
    out = model.apply({**variables, "params": params}, small_images)
    mean = hmr_lib.default_mean_params()
    np.testing.assert_allclose(np.asarray(out.pose6d[0]), mean[:144], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.shape[0]), mean[144:154], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.cam[0]), mean[154:], atol=1e-6)


def test_jit_and_batch_independence(model_and_vars, small_images):
    model, variables = model_and_vars
    fn = jax.jit(lambda imgs: model.apply(variables, imgs))
    out2 = fn(small_images)
    out1 = fn(small_images[:1].repeat(2, axis=0))
    # Per-sample outputs must not leak across the batch.
    np.testing.assert_allclose(
        np.asarray(out1.shape[0]), np.asarray(out1.shape[1]), atol=1e-6)
    assert not np.allclose(np.asarray(out2.shape[0]), np.asarray(out2.shape[1]))


def test_torch_state_dict_conversion():
    """A synthetic torch-style state dict converts to the exact Flax tree."""
    rng = np.random.default_rng(1)
    sd = {}
    def bn_stats(prefix, ch):
        sd[f"{prefix}.weight"] = rng.normal(size=(ch,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(ch,)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(size=(ch,)).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, size=(ch,)).astype(np.float32)

    sd["conv1.weight"] = (0.01 * rng.normal(size=(64, 3, 7, 7))).astype(np.float32)
    bn_stats("bn1", 64)
    feats = (64, 128, 256, 512)
    in_ch = 64
    for i, n_blocks in enumerate((3, 4, 6, 3)):
        f = feats[i]
        for j in range(n_blocks):
            pre = f"layer{i+1}.{j}"
            sizes = [(f, in_ch if j == 0 else f * 4, 1, 1),
                     (f, f, 3, 3), (f * 4, f, 1, 1)]
            for c, s in zip((1, 2, 3), sizes):
                sd[f"{pre}.conv{c}.weight"] = (
                    0.01 * rng.normal(size=s)).astype(np.float32)
                bn_stats(f"{pre}.bn{c}", s[0])
            if j == 0:
                sd[f"{pre}.downsample.0.weight"] = (0.01 * rng.normal(
                    size=(f * 4, in_ch, 1, 1))).astype(np.float32)
                bn_stats(f"{pre}.downsample.1", f * 4)
        in_ch = f * 4
    sd["fc1.weight"] = (0.01 * rng.normal(size=(1024, 2048 + 144 + 13))).astype(np.float32)
    sd["fc1.bias"] = np.zeros(1024, np.float32)
    sd["fc2.weight"] = (0.01 * rng.normal(size=(1024, 1024))).astype(np.float32)
    sd["fc2.bias"] = np.zeros(1024, np.float32)
    for head, n in (("decpose", 144), ("decshape", 10), ("deccam", 3)):
        sd[f"{head}.weight"] = (0.01 * rng.normal(size=(n, 1024))).astype(np.float32)
        sd[f"{head}.bias"] = np.zeros(n, np.float32)

    converted = hmr_lib.convert_torch_state_dict(sd, hmr_lib.default_mean_params())
    model, variables = hmr_lib.create_hmr(dtype=jnp.float32, init="shape")

    ref_shapes = {jax.tree_util.keystr(p): v.shape
                  for p, v in jax.tree_util.tree_leaves_with_path(variables)}
    got_shapes = {jax.tree_util.keystr(p): v.shape
                  for p, v in jax.tree_util.tree_leaves_with_path(converted)}
    assert ref_shapes == got_shapes
    # And the converted weights actually run.
    out = model.apply(converted, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out.shape)).all()


class TestStem:
    """The s2d (space-to-depth) stem is numerically the conv7 stem."""

    @pytest.mark.slow
    def test_stems_agree(self):
        from tpubody.models.hmr import ResNet50
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        m7 = ResNet50(dtype=jnp.float32, stem="conv7")
        ms = ResNet50(dtype=jnp.float32, stem="s2d")
        vs = m7.init(jax.random.PRNGKey(0), x)
        y7 = m7.apply(vs, x)
        ys = ms.apply(vs, x)          # same variables: same param path
        np.testing.assert_allclose(np.asarray(ys), np.asarray(y7),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_odd_input_falls_back(self):
        from tpubody.models.hmr import ResNet50
        x = jnp.zeros((1, 63, 63, 3), jnp.float32)
        m = ResNet50(dtype=jnp.float32, stem="s2d")
        vs = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(vs, x).shape == (1, 2048)

    def test_param_path_matches_torch_conversion(self):
        """conv1/kernel path is unchanged, so torch checkpoints load into
        either stem (models/hmr.py:49-111 naming)."""
        model, variables = hmr_lib.create_hmr(dtype=jnp.float32, stem="s2d",
                                              init="shape")
        assert variables["params"]["backbone"]["conv1"]["kernel"].shape == \
            (7, 7, 3, 64)


@pytest.mark.slow  # compile-heavy; fast-suite budget
def test_remat_backbone_matches_plain():
    """remat=True recomputes activations but must produce identical
    outputs AND gradients (same param tree, same math)."""
    imgs = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 32, 32, 3)), jnp.float32)
    kw = dict(dtype=jnp.float32, stage_sizes=(1, 1))
    plain = hmr_lib.ResNet50(remat=False, **kw)
    remat = hmr_lib.ResNet50(remat=True, **kw)
    variables = plain.init(jax.random.PRNGKey(0), imgs)
    # identical parameter trees (remat preserves module names/shapes)
    v2 = remat.init(jax.random.PRNGKey(0), imgs)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)

    out_p = plain.apply(variables, imgs)
    out_r = remat.apply(variables, imgs)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               atol=1e-6)

    def loss(params, model):
        return jnp.sum(model.apply(
            {**variables, "params": params}, imgs) ** 2)

    g_p = jax.grad(loss)(variables["params"], plain)
    g_r = jax.grad(loss)(variables["params"], remat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5), g_p, g_r)

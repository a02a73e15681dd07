"""PTQ int8 HMR: BN folding exactness + quantized-path fidelity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.models import hmr as hmr_lib
from tpubody.models import hmr_quant as hq


@pytest.fixture(scope="module")
def model_and_images():
    # Real init (not shape-init): BN folding needs non-degenerate stats
    # and the parity test needs the true forward.  Small image keeps the
    # 1-core XLA:CPU compile manageable.
    model, variables = hmr_lib.create_hmr(dtype=jnp.float32, image_size=48)
    # Give batch_stats non-trivial means/vars so folding is actually
    # exercised (init leaves mean=0, var=1 -> folding would be trivial).
    rng = np.random.default_rng(0)
    bs = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.uniform(0.5, 1.5, x.shape) if x.ndim else x, x.dtype),
        variables["batch_stats"])
    variables = {**variables, "batch_stats": bs}
    images = jnp.asarray(rng.normal(scale=0.5, size=(2, 48, 48, 3)),
                         jnp.float32)
    return model, variables, images


class TestFolding:
    @pytest.mark.slow  # real ResNet init + two forward compiles (1-core CPU)
    def test_folded_f32_matches_flax_inference(self, model_and_images):
        model, variables, images = model_and_images
        want = model.apply(variables, images)
        folded = hq.fold_batchnorm(variables)
        got = hq.forward_folded(folded, images)
        np.testing.assert_allclose(np.asarray(got.pose6d),
                                   np.asarray(want.pose6d), atol=2e-4)
        np.testing.assert_allclose(np.asarray(got.shape),
                                   np.asarray(want.shape), atol=2e-4)
        np.testing.assert_allclose(np.asarray(got.cam),
                                   np.asarray(want.cam), atol=2e-4)

    def test_fold_algebra(self):
        """_fold: conv(x)*g + (beta - mean*g) == BN(conv(x)) exactly."""
        rng = np.random.default_rng(1)
        k = jnp.asarray(rng.normal(size=(3, 3, 4, 8)), jnp.float32)
        bn = {"scale": jnp.asarray(rng.uniform(0.5, 2, 8), jnp.float32),
              "bias": jnp.asarray(rng.normal(size=8), jnp.float32),
              "mean": jnp.asarray(rng.normal(size=8), jnp.float32),
              "var": jnp.asarray(rng.uniform(0.5, 2, 8), jnp.float32)}
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)), jnp.float32)
        raw = hq._conv(x, k, (1, 1), ((1, 1), (1, 1)))
        bn_out = (raw - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) \
            * bn["scale"] + bn["bias"]
        wf, bf = hq._fold(k, bn)
        folded_out = hq._conv(x, wf, (1, 1), ((1, 1), (1, 1))) + bf
        np.testing.assert_allclose(np.asarray(folded_out),
                                   np.asarray(bn_out), atol=1e-5)


class TestQuantized:
    @pytest.mark.slow
    def test_int8_forward_tracks_f32(self, model_and_images):
        model, variables, images = model_and_images
        folded = hq.fold_batchnorm(variables)
        qp = hq.quantize_hmr(variables, images)
        ref = hq.forward_folded(folded, images)
        got = jax.jit(hq.forward)(qp, images)
        # Pose head outputs stay close on the calibration distribution
        # (random-init weights; a trained checkpoint is the real gauge).
        err = np.abs(np.asarray(got.pose6d) - np.asarray(ref.pose6d)).max()
        scale = np.abs(np.asarray(ref.pose6d)).max() + 1e-6
        assert err / scale < 0.15, (err, scale)
        # Rotations remain valid rotation matrices.
        R = np.asarray(got.rotmats).reshape(-1, 3, 3)
        np.testing.assert_allclose(R @ np.transpose(R, (0, 2, 1)),
                                   np.broadcast_to(np.eye(3), R.shape),
                                   atol=1e-4)

    @pytest.mark.slow
    def test_weights_are_int8_and_scales_positive(self, model_and_images):
        _, variables, images = model_and_images
        qp = hq.quantize_hmr(variables, images)
        assert qp["stem"].w.dtype == jnp.int8
        for stage in qp["blocks"]:
            for blk in stage:
                for key, qc in blk.items():
                    assert qc.w.dtype == jnp.int8, key
                    assert float(qc.w_scale.min()) > 0
                    assert float(qc.x_scale) > 0
                    assert int(jnp.max(jnp.abs(qc.w.astype(jnp.int32)))) <= 127

    def test_quantized_conv_roundtrip_exact_for_representable(self):
        """Inputs/weights exactly on the quantization grid pass through
        the int8 conv with zero error."""
        qc = hq.QConv(
            w=jnp.asarray(np.array([[[[2], [3]]]]).transpose(0, 1, 2, 3),
                          jnp.int8).reshape(1, 1, 2, 1),
            w_scale=jnp.asarray([0.5], jnp.float32),
            b=jnp.asarray([1.0], jnp.float32),
            x_scale=jnp.asarray(0.25, jnp.float32),
            strides=(1, 1), padding=((0, 0), (0, 0)))
        x = jnp.asarray(np.full((1, 2, 2, 2), 0.75), jnp.float32)  # 3*0.25
        out = hq._qconv_apply(qc, x)
        # acc = 3*(2+3) = 15; dequant = 15*0.25*0.5 + 1 = 2.875
        np.testing.assert_allclose(np.asarray(out), 2.875, atol=1e-6)

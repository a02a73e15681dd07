"""Fused residual-stage Pallas kernel vs the Flax Bottleneck chain.

The kernel (models/pallas_resnet.py) computes the same math as
models/hmr.py Bottleneck stages (inference mode, BN folded), in a
channel-major layout with roll-based im2col; agreement here is to bf16
roundoff.  Runs in interpret mode on CPU.
"""
import jax

jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

from tpubody.models import pallas_resnet as PR
from tpubody.models.hmr import Bottleneck


class _Blocks(nn.Module):
    stage: int
    n: int
    feats: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j in range(self.n):
            x = Bottleneck(self.feats, strides=1, dtype=self.dtype,
                           name=f"layer{self.stage}_{j}")(x, False)
        return x


def _random_vars(mod, example, seed=0, lo=0.05, hi=0.4):
    """Init then randomize: nonzero weights AND nontrivial batch_stats so
    the BN folding is exercised (plain init has mean=0, var=1)."""
    rng = np.random.default_rng(seed)
    vs = mod.init(jax.random.PRNGKey(0), example)
    leaves, treedef = jax.tree_util.tree_flatten(vs)
    leaves = [jnp.asarray(rng.uniform(lo, hi, np.shape(l)), l.dtype)
              for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _compare(mod, vs, x, blocks, stage):
    y_ref = np.asarray(mod.apply(vs, x), np.float32)
    fused = PR.fuse_stage(vs["params"], vs["batch_stats"], stage, blocks)
    y = np.asarray(PR.run_stage(x, fused, interpret=True), np.float32)
    assert y.shape == y_ref.shape
    scale = np.abs(y_ref).max() + 1e-9
    rel = np.abs(y - y_ref).max() / scale
    # bf16 has ~2-3 significant digits; a 3-block chain compounds to ~1%.
    assert rel < 2e-2, rel
    return y, y_ref


class TestFusedStage:
    @pytest.mark.slow  # compile-heavy; fast-suite budget
    def test_matches_flax_with_downsample(self):
        """Stage-1 shape: block 0 widens C_in -> 4*feats via the
        downsample 1x1 (the layer1 configuration)."""
        mod = _Blocks(stage=1, n=3, feats=4)
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 12, 12, 8)).astype(np.float32))
        vs = _random_vars(mod, x[:1])
        _compare(mod, vs, x, [0, 1, 2], 1)

    def test_matches_flax_identity_residual(self):
        """No width change, no downsample: the residual is the block input
        itself (the layer2 blocks 1..3 configuration)."""
        mod = _Blocks(stage=2, n=2, feats=4)
        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(2, 8, 8, 16)).astype(np.float32))
        vs = _random_vars(mod, x[:1])
        fused = PR.fuse_stage(vs["params"], vs["batch_stats"], 2, [0, 1])
        assert fused.Ad is None
        _compare(mod, vs, x, [0, 1], 2)

    def test_single_block(self):
        mod = _Blocks(stage=1, n=1, feats=4)
        x = jnp.asarray(np.random.default_rng(3).normal(
            size=(1, 10, 10, 8)).astype(np.float32))
        vs = _random_vars(mod, x)
        fused = PR.fuse_stage(vs["params"], vs["batch_stats"], 1, [0])
        assert fused.n_rest == 0
        _compare(mod, vs, x, [0], 1)

    def test_lane_padding_roll_wraparound_is_masked(self):
        """A grid whose padded size is far from a multiple of 128 forces
        roll wrap-around through the lane padding — the interior must
        still be exact (the mask re-zeroes ring+pad every block)."""
        mod = _Blocks(stage=1, n=2, feats=4)
        # (H+2)*(W+2) = 13*21 = 273 -> lane pad to 384 (111 pad cols).
        x = jnp.asarray(np.random.default_rng(4).normal(
            size=(2, 11, 19, 8)).astype(np.float32))
        vs = _random_vars(mod, x[:1])
        _compare(mod, vs, x, [0, 1], 1)

    def test_rejects_downsample_after_first(self):
        mod = _Blocks(stage=1, n=2, feats=4)
        x = jnp.zeros((1, 8, 8, 8))
        vs = mod.init(jax.random.PRNGKey(0), x)
        # Fusing from block 1 with block 0's widened output would need a
        # downsample in a rest block if widths mismatched; simulate by
        # asking for [1, 0] (block 0 carries the downsample).
        with pytest.raises(ValueError):
            PR.fuse_stage(vs["params"], vs["batch_stats"], 1, [1, 0])

    def test_zero_input_maps_to_bias_response(self):
        """Zero input exercises the folded biases + ring masking alone:
        output must equal the flax response to zeros (nonzero because of
        BN shifts), with a zero ring kept zero internally."""
        mod = _Blocks(stage=1, n=2, feats=4)
        x = jnp.zeros((1, 9, 9, 8), jnp.float32)
        vs = _random_vars(mod, jnp.zeros((1, 9, 9, 8)), seed=5)
        _compare(mod, vs, x, [0, 1], 1)

import json
import os
import time

import jax
import numpy as np
import pytest

from tpubody.utils.cache import StageCache, digest
from tpubody.utils.profiling import StageTimer


class TestDigest:
    def test_deterministic(self):
        a = np.arange(10.0)
        assert digest(a, k=1) == digest(a.copy(), k=1)

    def test_sensitive_to_values_and_kwargs(self):
        a = np.arange(10.0)
        assert digest(a) != digest(a + 1)
        assert digest(a, k=1) != digest(a, k=2)
        assert digest(a) != digest(a.astype(np.float32))

    def test_none_ok(self):
        assert digest(None) == digest(None)


class TestStageCache:
    def test_put_get_roundtrip(self, tmp_path):
        sc = StageCache(str(tmp_path))
        arts = {"x.npy": np.arange(5.0), "y.npy": np.eye(2)}
        sc.put("stage1", "h1", arts)
        got = sc.get("stage1", "h1", ["x.npy", "y.npy"])
        assert got is not None
        np.testing.assert_array_equal(got["x.npy"], arts["x.npy"])

    def test_hash_mismatch_misses(self, tmp_path):
        sc = StageCache(str(tmp_path))
        sc.put("s", "h1", {"x.npy": np.zeros(3)})
        assert sc.get("s", "other", ["x.npy"]) is None

    def test_run_computes_once(self, tmp_path):
        sc = StageCache(str(tmp_path))
        calls = []

        def compute():
            calls.append(1)
            return {"z.npy": np.ones(4)}

        sc.run("s", "h", ["z.npy"], compute)
        sc.run("s", "h", ["z.npy"], compute)
        assert len(calls) == 1

    def test_manifest_survives_reload(self, tmp_path):
        StageCache(str(tmp_path)).put("s", "h", {"x.npy": np.zeros(2)})
        sc2 = StageCache(str(tmp_path))
        assert sc2.get("s", "h", ["x.npy"]) is not None

    def test_disabled_cache_always_misses(self, tmp_path):
        sc = StageCache(str(tmp_path), enabled=False)
        sc.put("s", "h", {"x.npy": np.zeros(2)})
        assert sc.get("s", "h", ["x.npy"]) is None


class TestStageTimer:
    def test_records_and_reports(self, tmp_path):
        t = StageTimer()
        with t.stage("alpha"):
            time.sleep(0.01)
        with t.stage("beta"):
            pass
        rep = t.report()
        assert "alpha" in rep and "beta" in rep and "TOTAL" in rep
        p = str(tmp_path / "t.json")
        t.dump(p)
        recs = json.load(open(p))
        assert recs[0]["stage"] == "alpha"
        assert recs[0]["seconds"] >= 0.01


class TestCLIMain:
    @pytest.mark.slow
    def test_animate_command(self, tmp_path):
        from tests.test_animate import _sphere_avatar
        from tpubody.io import motion as motion_lib
        from tpubody.mesh import rigging
        from tpubody import cli

        avp = str(tmp_path / "avatar.pkl")
        rigging.save_avatar(avp, _sphere_avatar())
        clip = str(tmp_path / "result.pkl")
        motion_lib.save_mixamo(clip, np.zeros((3, 24, 3)), fps=30.0)
        out = str(tmp_path / "v.mp4")
        rc = cli.main(["animate", avp, clip, out,
                       "--size", "64", "--cam-z", "3.0"])
        assert rc == 0
        assert os.path.getsize(out) > 0


class TestCheckpoint:
    def test_pytree_roundtrip(self, tmp_path):
        from tpubody.utils import checkpoint as ckpt
        tree = {"a": np.arange(5.0), "b": {"c": np.eye(3, dtype=np.float32)}}
        p = str(tmp_path / "ck")
        ckpt.save_pytree(p, tree)
        back = ckpt.restore_pytree(p)
        np.testing.assert_array_equal(back["a"], tree["a"])
        np.testing.assert_array_equal(back["b"]["c"], tree["b"]["c"])

    @pytest.mark.slow
    def test_train_state_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        import optax
        from tpubody.models import hmr as hmr_lib, hmr_train
        from tpubody.utils import checkpoint as ckpt
        model = hmr_lib.HMR(mean_params=hmr_lib.default_mean_params(),
                            n_iter=1, dtype=jnp.float32)
        tx = optax.sgd(1e-3)
        state = hmr_train.create_train_state(model, tx, image_size=32)
        p = str(tmp_path / "ts")
        ckpt.save_train_state(p, state)
        restored = ckpt.restore_train_state(p, state)
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)


class TestMetrics:
    def test_jsonl_roundtrip(self, tmp_path):
        from tpubody.utils.metrics import MetricsLogger, read_jsonl
        p = str(tmp_path / "m.jsonl")
        with MetricsLogger(p) as m:
            m.log("train", step=0, loss=1.5)
            m.log("train", step=1, loss=0.75, lr=1e-3)
            m.log("eval", pck=0.9)
        recs = read_jsonl(p)
        assert len(recs) == 3
        assert recs[1]["loss"] == 0.75 and recs[1]["step"] == 1
        assert recs[2]["tag"] == "eval" and "step" not in recs[2]

    def test_tensorboard_sink_optional(self, tmp_path):
        from tpubody.utils.metrics import MetricsLogger
        with MetricsLogger(str(tmp_path / "m.jsonl"),
                           tb_dir=str(tmp_path / "tb")) as m:
            m.log("train", step=0, loss=2.0)
        # events file written if tensorboardX is available; logger must
        # not fail either way
        assert (tmp_path / "m.jsonl").exists()


class TestShapeInit:
    def test_matches_real_init_structure(self):
        """shape_init's tree has exactly real init's paths/shapes/dtypes,
        BN stats are identity, and kernels are nonzero."""
        import flax.linen as nn
        import jax.numpy as jnp
        from tpubody.utils.flaxtools import shape_init

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(4, (3, 3), use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=True)(x)
                return nn.Dense(2)(x.mean(axis=(1, 2)))

        m = Tiny()
        ex = jnp.zeros((1, 8, 8, 3))
        real = m.init(jax.random.PRNGKey(0), ex)
        fast = shape_init(m, ex)
        rs = {jax.tree_util.keystr(p): (v.shape, v.dtype)
              for p, v in jax.tree_util.tree_leaves_with_path(real)}
        fs = {jax.tree_util.keystr(p): (v.shape, np.asarray(v).dtype)
              for p, v in jax.tree_util.tree_leaves_with_path(fast)}
        assert rs == fs
        bs = fast["batch_stats"]["BatchNorm_0"]
        np.testing.assert_array_equal(np.asarray(bs["var"]), 1.0)
        np.testing.assert_array_equal(np.asarray(bs["mean"]), 0.0)
        assert np.abs(np.asarray(
            fast["params"]["Conv_0"]["kernel"])).max() > 0
        # And the materialized tree actually runs.
        out = m.apply(fast, ex)
        assert np.isfinite(np.asarray(out)).all()

    def test_deterministic(self):
        import flax.linen as nn
        import jax.numpy as jnp
        from tpubody.utils.flaxtools import shape_init

        m = nn.Dense(3)
        ex = jnp.zeros((1, 5))
        a = shape_init(m, ex)
        b = shape_init(m, ex)
        np.testing.assert_array_equal(np.asarray(a["params"]["kernel"]),
                                      np.asarray(b["params"]["kernel"]))

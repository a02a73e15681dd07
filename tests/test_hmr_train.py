import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpubody.models import hmr as hmr_lib
from tpubody.models import hmr_train
from tpubody.models import params as params_lib


@pytest.fixture(scope="module")
def setup():
    model = hmr_lib.HMR(mean_params=hmr_lib.default_mean_params(),
                        n_iter=3, dtype=jnp.float32)
    smpl = params_lib.synthetic(n_joints=24, n_verts=200, seed=0)
    tx = optax.adam(1e-4)
    state = hmr_train.create_train_state(model, tx, image_size=64)
    return model, smpl, tx, state


def _batch(B=2, size=64, seed=0):
    rng = np.random.default_rng(seed)
    return hmr_train.TrainBatch(
        images=jnp.asarray(rng.normal(size=(B, size, size, 3)), jnp.float32),
        keypoints2d=jnp.asarray(
            np.concatenate([rng.uniform(0, size, (B, 24, 2)),
                            np.ones((B, 24, 1))], axis=-1), jnp.float32),
        has_smpl=jnp.ones(B),
        gt_rotmats=jnp.broadcast_to(jnp.eye(3), (B, 24, 3, 3)),
        gt_shape=jnp.zeros((B, 10)))


@pytest.mark.slow
def test_train_step_decreases_loss(setup):
    model, smpl, tx, state = setup
    step = jax.jit(hmr_train.make_train_step(model, smpl, tx,
                                             img_size=64.0))
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_metrics_structure(setup):
    model, smpl, tx, state = setup
    step = jax.jit(hmr_train.make_train_step(model, smpl, tx, img_size=64.0))
    state, metrics = step(state, _batch(), jax.random.PRNGKey(2))
    assert set(metrics) == {"loss", "kp", "pose", "shape"}
    assert int(state.step) == 1


@pytest.mark.slow
def test_no_smpl_supervision_masks_param_losses(setup):
    model, smpl, tx, state = setup
    step = jax.jit(hmr_train.make_train_step(model, smpl, tx, img_size=64.0))
    batch = _batch()._replace(has_smpl=jnp.zeros(2))
    _, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert float(metrics["pose"]) == 0.0
    assert float(metrics["shape"]) == 0.0


@pytest.mark.slow  # compiles HMR apply + eval program (~40 s on 1-core CPU)
def test_eval_step_metrics(setup):
    """make_eval_step: zero error when GT rotmats/shape equal the
    prediction path's own LBS output; positive error otherwise; has_smpl
    masking drops unlabeled examples from the means."""
    model, smpl, tx, state = setup
    batch = _batch(B=2)
    eval_step = jax.jit(hmr_train.make_eval_step(model, smpl))

    # Self-consistency: evaluate the model's own predictions as "GT".
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch.images)
    self_batch = batch._replace(gt_rotmats=out.rotmats, gt_shape=out.shape)
    m0 = {k: float(v) for k, v in eval_step(state, self_batch).items()}
    assert m0["mpjpe"] < 1e-5 and m0["pa_mpjpe"] < 1e-4 and m0["pve"] < 1e-5

    # Identity-pose GT differs from the prediction -> positive errors,
    # and PA-MPJPE can only improve on MPJPE.
    m1 = {k: float(v) for k, v in eval_step(state, batch).items()}
    assert m1["mpjpe"] > 0 and m1["pve"] > 0
    assert m1["pa_mpjpe"] <= m1["mpjpe"] + 1e-6

    # Masking: zeroing one example's has_smpl changes the mean.
    masked = batch._replace(has_smpl=jnp.asarray([1.0, 0.0]))
    m2 = {k: float(v) for k, v in eval_step(state, masked).items()}
    assert np.isfinite(m2["mpjpe"])

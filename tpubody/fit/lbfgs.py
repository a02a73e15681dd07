"""Jit-compatible L-BFGS minimizer with strong-Wolfe line search.

Capability parity with the reference's LBFGS-LS optimizer + FittingMonitor
stopping rules (lib/Gen_SMPLH/optimizers/lbfgs_ls.py:12-446 strong-Wolfe
cubic line search; lib/Gen_SMPLH/fitting.py:147-214 ftol/gtol/NaN guards),
built TPU-first on ``optax.lbfgs`` (zoom line search satisfying the strong
Wolfe conditions) inside a single ``lax.while_loop`` — the entire staged
optimization compiles to one XLA program instead of hundreds of host-driven
closure calls.

Works on pytrees of parameters (the fitting stages optimize dicts of
camera/pose/shape leaves).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class MinimizeResult(NamedTuple):
    params: Any
    loss: jnp.ndarray
    n_iters: jnp.ndarray
    converged: jnp.ndarray


def minimize(
    fun: Callable[[Any], jnp.ndarray],
    x0: Any,
    maxiter: int = 30,
    ftol: float = 1e-9,
    gtol: float = 1e-9,
    memory_size: int = 10,
    max_linesearch_steps: int = 20,
) -> MinimizeResult:
    """Minimize ``fun`` from ``x0``.

    Stopping rules match FittingMonitor.run_fitting (fitting.py:174-193):
    abort on non-finite loss, stop when the relative loss change is below
    ftol or the max absolute gradient is below gtol.
    """
    solver = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps))
    value_and_grad = optax.value_and_grad_from_state(fun)

    def max_abs_grad(g):
        leaves = jax.tree_util.tree_leaves(g)
        return jnp.max(jnp.asarray([jnp.max(jnp.abs(l)) for l in leaves]))

    def cond(state):
        params, opt_state, prev_loss, loss, it, done = state
        return (~done) & (it < maxiter)

    def body(state):
        params, opt_state, prev_loss, loss, it, _ = state
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=fun)
        new_params = optax.apply_updates(params, updates)
        new_loss = optax.tree_utils.tree_get(opt_state, "value")

        rel_change = jnp.abs(loss - new_loss) / jnp.maximum(
            jnp.maximum(jnp.abs(loss), jnp.abs(new_loss)), 1.0)
        small_step = rel_change < ftol
        small_grad = max_abs_grad(grad) < gtol
        params_ok = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(l))
             for l in jax.tree_util.tree_leaves(new_params)]))
        bad = ~jnp.isfinite(new_loss) | ~params_ok
        done = small_step | small_grad | bad
        # Abort on non-finite loss: keep the previous params AND loss
        # (reference fitting.py:177-182).
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(bad, old, new), new_params, params)
        new_loss = jnp.where(bad, loss, new_loss)
        return (new_params, opt_state, loss, new_loss, it + 1, done)

    init_loss = fun(x0)
    init = (x0, solver.init(x0), jnp.inf, init_loss,
            jnp.asarray(0), jnp.asarray(False))
    params, _, _, loss, it, done = jax.lax.while_loop(cond, body, init)
    return MinimizeResult(params=params, loss=loss, n_iters=it,
                          converged=done)


@functools.partial(jax.jit, static_argnames=("fun", "maxiter"))
def minimize_jit(fun, x0, maxiter: int = 30):
    """Jitted convenience wrapper (fun must be hashable, e.g. a module-level
    function or functools.partial of one)."""
    return minimize(fun, x0, maxiter=maxiter)

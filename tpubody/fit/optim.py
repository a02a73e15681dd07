"""Optimizer factory for the fitting subsystem.

Parity with the reference's ``create_optimizer``
(lib/Gen_SMPLH/optimizers/optim_factory.py:27-65), which dispatches on a
config string to adam / lbfgs / lbfgsls / rmsprop / sgd.  Here the
first-order optimizers are optax gradient transformations (jit-friendly,
composable with the staged fitting loop), and both L-BFGS variants map to
the strong-Wolfe minimizer in :mod:`tpubody.fit.lbfgs` — one compiled
``lax.while_loop``, not a Python step loop.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp
import optax

from tpubody.fit import lbfgs as lbfgs_lib


class Optimizer(NamedTuple):
    """Either a first-order optax transform or a full minimizer.

    ``minimize(fun, x0)`` is always available; for first-order optimizers it
    runs ``maxiters`` fixed steps of the optax update rule under jit.
    """

    name: str
    tx: Any  # optax.GradientTransformation or None for L-BFGS
    minimize: Callable[..., Any]


def _with_scales(run, scales):
    """Per-parameter-group diagonal preconditioning by reparameterization.

    ``scales`` maps parameter-dict keys to step scales; the minimizer runs
    in y-space where ``x = s * y``, so a group with scale s takes s-times
    larger steps per unit trust region.  This is the cure for compensation
    valleys on redundant kinematic chains (a single small joint — e.g. the
    SMPL-X jaw — being absorbed by global pose/shape because full-space
    L-BFGS sees it as a low-curvature direction).  Identity for missing
    keys; ``x0`` must be a flat dict of arrays (the fitting stages' shape).
    """
    if not scales:
        return run

    import jax.numpy as jnp

    def wrapped(fun, x0, **kw):
        s = {k: jnp.asarray(float(scales.get(k, 1.0)), jnp.float32)
             for k in x0}
        y0 = {k: x0[k] / s[k] for k in x0}
        res = run(lambda y: fun({k: y[k] * s[k] for k in y}), y0, **kw)
        return res._replace(
            params={k: res.params[k] * s[k] for k in res.params})

    return wrapped


def _first_order_minimizer(tx: optax.GradientTransformation, maxiters: int):
    import jax
    import jax.numpy as jnp

    def run(fun, x0, maxiters_op=None):
        """``maxiters_op``: optional traced iteration budget <= the static
        ``maxiters`` — steps past the budget become no-ops (the scan length
        is static, so a first-order budget saves no compute, but the
        semantics match the L-BFGS path where it does)."""
        opt_state = tx.init(x0)
        budget = (jnp.asarray(maxiters, jnp.int32) if maxiters_op is None
                  else jnp.asarray(maxiters_op, jnp.int32))

        def step(carry, i):
            x, s, last = carry
            live = i < budget
            loss, g = jax.value_and_grad(fun)(x)
            updates, s2 = tx.update(g, s, x)
            x2 = optax.apply_updates(x, updates)
            keep = lambda a, b: jax.tree_util.tree_map(  # noqa: E731
                lambda u, v: jnp.where(live, u, v), a, b)
            # budget == 0 still reports fun(x0), like the L-BFGS path.
            last = jnp.where(live | (i == 0), loss, last)
            return (keep(x2, x), keep(s2, s), last), None

        (x, _, loss), _ = jax.lax.scan(
            step, (x0, opt_state, jnp.asarray(jnp.inf, jnp.float32)),
            jnp.arange(maxiters))
        return lbfgs_lib.MinimizeResult(
            params=x, loss=loss, n_iters=budget,
            converged=jnp.asarray(True))

    return run


def create_optimizer(optim_type: str = "lbfgsls",
                     lr: float = 1e-3,
                     momentum: float = 0.9,
                     use_nesterov: bool = True,
                     beta1: float = 0.9,
                     beta2: float = 0.999,
                     epsilon: float = 1e-8,
                     weight_decay: float = 0.0,
                     centered: bool = False,
                     rmsprop_alpha: float = 0.99,
                     maxiters: int = 20,
                     gtol: float = 1e-6,
                     ftol: float = 1e-9,
                     param_scales: Any = None,
                     **_: Any) -> Optimizer:
    """Build the optimizer named by ``optim_type`` (same names and knobs as
    the reference factory; unknown names raise ValueError).

    ``param_scales`` (mapping: parameter-dict key -> float) preconditions
    the named groups — see :func:`_with_scales`."""
    if optim_type == "adam":
        tx = optax.adamw(lr, b1=beta1, b2=beta2, eps=epsilon,
                         weight_decay=weight_decay) if weight_decay else \
            optax.adam(lr, b1=beta1, b2=beta2, eps=epsilon)
        run = _first_order_minimizer(tx, maxiters)
    elif optim_type in ("lbfgs", "lbfgsls"):
        tx = None

        def run(fun, x0, maxiters_op=None):
            # maxiters_op: optional TRACED iteration budget (the while_loop
            # bound takes operands) — warm-started refits pass a smaller
            # budget through the SAME compiled program, no recompile.
            m = maxiters if maxiters_op is None else \
                jnp.minimum(jnp.asarray(maxiters_op, jnp.int32), maxiters)
            return lbfgs_lib.minimize(fun, x0, maxiter=m,
                                      gtol=gtol, ftol=ftol)
    elif optim_type == "rmsprop":
        tx = optax.rmsprop(lr, decay=rmsprop_alpha, eps=epsilon,
                           centered=centered, momentum=momentum)
        run = _first_order_minimizer(tx, maxiters)
    elif optim_type == "sgd":
        tx = optax.sgd(lr, momentum=momentum, nesterov=use_nesterov)
        run = _first_order_minimizer(tx, maxiters)
    else:
        raise ValueError(f"Optimizer {optim_type} not supported!")
    return Optimizer(optim_type, tx, _with_scales(run, param_scales))

"""Training/model checkpointing via orbax.

Complements the stage cache (utils/cache.py, the reference's .npy side-car
resume scheme) with proper pytree checkpoints for anything trained or
converted: HMR train states, converted torch weights, fitted parameters.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    """Save any JAX pytree (orbax requires an absolute, empty target dir)."""
    path = os.path.abspath(path)
    cp = _checkpointer()
    cp.save(path, jax.tree_util.tree_map(np.asarray, tree), force=True)


def restore_pytree(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; pass ``template`` to get the original container
    types and dtypes back."""
    path = os.path.abspath(path)
    cp = _checkpointer()
    if template is not None:
        import orbax.checkpoint as ocp
        return cp.restore(path, item=template)
    return cp.restore(path)


def save_train_state(path: str, state) -> None:
    """Save an hmr_train.TrainState (params/batch_stats/opt_state/step)."""
    save_pytree(path, state._asdict())


def restore_train_state(path: str, template):
    """Restore into the shape of ``template`` (a TrainState)."""
    restored = restore_pytree(path, template._asdict())
    return type(template)(**restored)

"""Compile-free Flax variable materialization.

``model.init`` traces AND compiles the full forward program just to produce
an initial variable tree — for ResNet-scale models that is tens of seconds
of XLA:CPU compile that is pure waste whenever the variables are about to be
overwritten by a checkpoint (pipelines/hmr_infer.py, cli --torch-ckpt) or
only the tree *structure* matters (tests, orbax restore targets).

``shape_init`` gets the variable tree via ``jax.eval_shape`` (trace only,
no compile, milliseconds) and materializes each leaf host-side with
deterministic, distribution-plausible values:

  * leaves named ``var`` -> 1.0, ``mean`` -> 0.0  (BatchNorm statistics)
  * leaves named ``scale`` -> 1.0, ``bias`` -> 0.0 (norm affine / biases)
  * everything else (conv/dense kernels, embeddings) -> seeded normal with
    LeCun-style 1/sqrt(fan_in) scaling, so activations neither explode nor
    collapse through deep stacks.

The values are NOT the model's own initializers — use real ``init`` when
initialization statistics matter (training from scratch).
"""
from __future__ import annotations

import zlib
from typing import Any

import jax
import numpy as np


def _materialize(path, leaf: jax.ShapeDtypeStruct, seed: int) -> np.ndarray:
    name = str(path[-1]) if path else ""
    # jax KeyPath entries stringify as ['name'] / .name; normalize.
    name = name.strip(".[]'\"")
    shape, dtype = leaf.shape, leaf.dtype
    if name in ("var", "scale"):
        return np.ones(shape, dtype)
    if name in ("mean", "bias"):
        return np.zeros(shape, dtype)
    fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else max(
        int(shape[0]) if shape else 1, 1)
    rng = np.random.default_rng(
        (seed << 32) ^ zlib.crc32(jax.tree_util.keystr(path).encode()))
    return (rng.standard_normal(shape, dtype=np.float32)
            / np.sqrt(max(fan_in, 1))).astype(dtype)


def shape_init(model, *init_args, rng: Any = None, seed: int = 0,
               **init_kwargs):
    """Variable tree for ``model`` with ``init``'s structure but no compile.

    ``init_args``/``init_kwargs`` are whatever ``model.init`` takes after
    the PRNG key (typically example inputs).  Returns a plain dict tree of
    numpy-backed arrays (device transfer happens lazily on first use).
    """
    if rng is None:
        rng = jax.random.PRNGKey(seed)
    abstract = jax.eval_shape(
        lambda *a, **k: model.init(rng, *a, **k), *init_args, **init_kwargs)
    return jax.tree_util.tree_map_with_path(
        lambda p, l: _materialize(p, l, seed), abstract)

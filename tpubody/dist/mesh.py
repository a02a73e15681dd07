"""Device-mesh and frames-axis sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.3); the natural
TPU parallel axis for this workload is *frames* (animation clips are 100s of
frames, batches of images for HMR).  This module provides:

  * ``make_mesh`` — a 1-D ``jax.sharding.Mesh`` over all addressable devices
    (or an explicit count) with a ``frames`` axis,
  * ``frames_sharding`` / ``replicated`` — ``NamedSharding`` constructors,
  * ``shard_frames`` — shard batched arrays' leading axis over the mesh,
  * ``pad_frames`` — round the frame axis up to a multiple of the mesh size
    (XLA requires even sharding; callers slice the result back).

Collectives ride ICI automatically: with inputs sharded over ``frames`` and
outputs requested replicated (e.g. a loss mean), XLA inserts the psum; video
assembly uses an all-gather induced by requesting fully-replicated output.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAMES_AXIS = "frames"


def make_mesh(n_devices: Optional[int] = None, axis: str = FRAMES_AXIS) -> Mesh:
    """A 1-D device mesh over ``n_devices`` (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def frames_sharding(mesh: Mesh, axis: str = FRAMES_AXIS) -> NamedSharding:
    """Shard the leading (frame) axis over the mesh; trailing dims replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (model params, small metadata)."""
    return NamedSharding(mesh, P())


def pad_frames(x: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Pad the leading axis to a multiple of ``n_shards`` (repeat-last pad)."""
    f = x.shape[0]
    rem = (-f) % n_shards
    if rem == 0:
        return x
    pad = jnp.repeat(x[-1:], rem, axis=0)
    return jnp.concatenate([x, pad], axis=0)


def shard_frames(tree, mesh: Mesh, axis: str = FRAMES_AXIS):
    """Device-put every array in ``tree`` with its leading axis sharded."""
    sh = frames_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    """Device-put every array in ``tree`` fully replicated."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

"""Multi-host (multi-process) frame sharding over DCN.

SURVEY.md §2.3/§5: the reference is single-process; the TPU-native design
scales the *frames* axis over a device mesh — ICI within a host/slice,
DCN across hosts.  This module is the thin multi-process layer on top of
``dist.mesh``:

  * ``initialize`` — ``jax.distributed.initialize`` glue with env-based
    defaults (on TPU pods every argument is auto-detected; for CPU/GPU
    test rigs pass coordinator/num_processes/process_id explicitly),
  * ``global_mesh`` — 1-D ``frames`` mesh over all *global* devices,
  * ``process_frame_slice`` — the contiguous frame range THIS process
    should load (each host reads only its shard from disk — the loader
    never materializes the full clip anywhere),
  * ``global_frames_array`` — assemble the logically-global sharded array
    from each process's host-local shard (no cross-host transfer: each
    host's data lands on its own devices; XLA moves data over DCN only
    when a collective needs it),
  * ``gather_frames_to_host`` — all-gather a frames-sharded array to every
    host (video assembly boundary; the mp4 mux is host-side).

Single-process callers can use everything here unchanged: ``initialize``
is a no-op without peers, and the helpers degrade to ``dist.mesh``
semantics on the local devices.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpubody.dist import mesh as mesh_lib

FRAMES_AXIS = mesh_lib.FRAMES_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> bool:
    """Join the multi-process runtime; returns True if distributed.

    No-ops (returns False) when there is nothing to join: no coordinator
    given and no pod/cluster environment detected.  Safe to call
    unconditionally at pipeline start.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("TPUBODY_COORDINATOR")
    in_cluster = any(os.environ.get(k) for k in
                     ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                      "TPU_WORKER_HOSTNAMES", "SLURM_JOB_ID"))
    if coordinator_address is None and not in_cluster:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return True


def global_mesh(axis: str = FRAMES_AXIS) -> Mesh:
    """1-D mesh over all global devices (every process sees the same)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_frame_slice(n_frames: int,
                        process_id: Optional[int] = None,
                        n_processes: Optional[int] = None
                        ) -> Tuple[int, int]:
    """[start, stop) frame range this process loads.

    Frames are padded logically to a multiple of the process count (the
    last process's range is clamped; pair with ``dist.mesh.pad_frames``
    on the shard if exact evenness is required by the computation).
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if n_processes is None else n_processes
    per = -(-n_frames // n)          # ceil
    start = min(pid * per, n_frames)
    stop = min(start + per, n_frames)
    return start, stop


def global_frames_array(local_frames: np.ndarray, mesh: Mesh
                        ) -> jax.Array:
    """Host-local frame shard -> logically-global frames-sharded array.

    ``local_frames`` is this process's ``process_frame_slice`` worth of
    data.  Every process must pass the same length, divisible by its local
    device count — pad with ``dist.mesh.pad_frames`` first (callers slice
    the padding back off after gathering).  The result behaves as the
    concatenation over processes, sharded over the mesh.
    """
    local_frames = np.asarray(local_frames)
    n_local = len(mesh.local_devices)
    if local_frames.shape[0] % n_local:
        raise ValueError(
            f"local frame count {local_frames.shape[0]} not divisible by "
            f"local device count {n_local}; pad with dist.mesh.pad_frames")
    sharding = NamedSharding(mesh, P(FRAMES_AXIS))
    global_shape = (local_frames.shape[0] * jax.process_count(),
                    *local_frames.shape[1:])
    per_dev = local_frames.shape[0] // n_local
    pieces = [
        jax.device_put(local_frames[i * per_dev:(i + 1) * per_dev], d)
        for i, d in enumerate(mesh.local_devices)
    ]
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, pieces)


def gather_frames_to_host(x: jax.Array) -> np.ndarray:
    """All-gather a frames-sharded array to host memory on every process
    (the video-assembly boundary)."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(
        x, tiled=True)) if jax.process_count() > 1 else np.asarray(x)

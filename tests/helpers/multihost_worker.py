"""Worker process for the multi-host (2-process CPU) dist test.

Usage: python multihost_worker.py <pid> <nproc> <port> <outdir>

Forces the CPU platform the same way conftest.py does (the container's
sitecustomize pre-registers the TPU plugin; env vars alone are too late),
carves 4 virtual CPU devices, joins the jax.distributed cluster, and runs
a frames-sharded computation whose results the parent asserts on.
"""
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], pathlib.Path(sys.argv[4])
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    from tpubody.dist import multihost

    ok = multihost.initialize(f"localhost:{port}", nproc, pid)
    assert ok, "initialize() returned False with an explicit coordinator"
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc
    mesh = multihost.global_mesh()

    n_frames = 24
    full = np.arange(n_frames * 5 * 3, dtype=np.float32).reshape(
        n_frames, 5, 3)
    start, stop = multihost.process_frame_slice(n_frames)
    local = full[start:stop]
    garr = multihost.global_frames_array(local, mesh)
    assert garr.shape == (n_frames, 5, 3)

    @jax.jit
    def step(x):
        # per-frame work + a cross-host (DCN in prod) reduction
        return x * 2.0 + 1.0, jnp.mean(x)

    y, m = step(garr)
    gathered = multihost.gather_frames_to_host(y)
    np.save(outdir / f"out_{pid}.npy", gathered)
    np.save(outdir / f"mean_{pid}.npy", np.asarray(jax.device_get(m)))
    np.save(outdir / f"slice_{pid}.npy", np.asarray([start, stop]))


if __name__ == "__main__":
    main()

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

    _animate_multihost(outdir)


def _animate_multihost(outdir: pathlib.Path) -> None:
    """Drive the process-parallel animation path: 5 frames over 2
    processes, 48x48 fragment renderer, gathered + muxed on process 0."""
    from tpubody.io import motion as motion_lib
    from tpubody.mesh import rigging
    from tpubody.models import params as params_lib
    from tpubody.pipelines import animate as animate_lib

    rng = np.random.default_rng(0)
    verts, faces = [], []
    n_theta = n_phi = 8
    for i in range(n_theta):
        for j in range(n_phi):
            th = np.pi * (i + 0.5) / n_theta
            ph = 2 * np.pi * j / n_phi
            verts.append([0.5 * np.sin(th) * np.cos(ph),
                          0.5 * np.cos(th),
                          0.5 * np.sin(th) * np.sin(ph)])
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces.append([a, b, c]); faces.append([b, d, c])
    verts = np.asarray(verts); faces = np.asarray(faces, np.int32)

    parents = params_lib.SMPL_PARENTS
    joints = np.zeros((24, 3))
    for i in range(1, 24):
        d = rng.normal(size=3); d /= np.linalg.norm(d)
        joints[i] = joints[parents[i]] + d * 0.08
    dist = np.linalg.norm(verts[:, None] - joints[None], axis=-1)
    w = np.exp(-dist / 0.05); w /= w.sum(1, keepdims=True)
    avatar = rigging.RiggedAvatar(
        v_template=verts, weights=w, color=np.full_like(verts, 0.6),
        faces=faces, joints=joints, parents=tuple(parents),
        or_pose=np.zeros((24, 3)), or_shape=np.zeros(10))
    clip = motion_lib.MotionClip(
        poses=0.1 * rng.normal(size=(5, 24, 3)),
        trans=np.zeros((5, 3)), fps=10.0)
    out = outdir / "clip.mp4"
    animate_lib.animate_video(
        avatar, clip, str(out), cam_t=np.asarray([0.0, 0.0, 3.0]),
        size=48, focal=100.0, chunk=2, window=48, multihost=True)


if __name__ == "__main__":
    main()

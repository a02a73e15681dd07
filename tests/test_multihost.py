"""Multi-host frame sharding (dist/multihost.py).

Single-process helpers are tested in-process; the real 2-process path
spawns two CPU workers that join one jax.distributed cluster (8 global
virtual devices) and assert the frames-sharded computation + allgather
round-trips — the CPU stand-in for multi-host DCN (SURVEY.md §2.3).
"""
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

from tpubody.dist import multihost

HELPER = pathlib.Path(__file__).parent / "helpers" / "multihost_worker.py"


class TestSingleProcess:
    def test_initialize_noop_without_cluster(self, monkeypatch):
        for k in ("TPUBODY_COORDINATOR", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                  "SLURM_JOB_ID"):
            monkeypatch.delenv(k, raising=False)
        assert multihost.initialize() is False

    def test_process_frame_slice_partitions(self):
        slices = [multihost.process_frame_slice(10, pid, 4)
                  for pid in range(4)]
        assert slices[0] == (0, 3)
        assert slices[-1][1] == 10
        covered = []
        for s, e in slices:
            covered.extend(range(s, e))
        assert covered == list(range(10))

    def test_global_frames_array_single_process(self):
        mesh = multihost.global_mesh()
        n = len(mesh.devices.ravel())
        data = np.arange(n * 2 * 3, dtype=np.float32).reshape(n * 2, 3)
        arr = multihost.global_frames_array(data, mesh)
        np.testing.assert_array_equal(np.asarray(arr), data)
        assert len(arr.sharding.device_set) == n

    def test_global_frames_array_rejects_ragged(self):
        mesh = multihost.global_mesh()
        n = len(mesh.devices.ravel())
        if n == 1:
            pytest.skip("needs >1 device to be ragged")
        data = np.zeros((n + 1, 3), np.float32)
        with pytest.raises(ValueError, match="pad_frames"):
            multihost.global_frames_array(data, mesh)

    def test_gather_passthrough(self):
        import jax.numpy as jnp
        x = jnp.arange(6.0).reshape(2, 3)
        np.testing.assert_array_equal(
            multihost.gather_frames_to_host(x), np.asarray(x))


@pytest.mark.slow
class TestTwoProcesses:
    def test_two_process_cluster_shards_and_gathers(self, tmp_path):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [
            subprocess.Popen(
                [sys.executable, str(HELPER), str(pid), "2", str(port),
                 str(tmp_path)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for pid in range(2)
        ]
        logs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            logs.append(out.decode(errors="replace"))
        assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

        n_frames = 24
        full = np.arange(n_frames * 5 * 3, dtype=np.float32).reshape(
            n_frames, 5, 3)
        expect = full * 2.0 + 1.0
        for pid in range(2):
            got = np.load(tmp_path / f"out_{pid}.npy")
            np.testing.assert_allclose(got, expect, rtol=1e-6)
            mean = np.load(tmp_path / f"mean_{pid}.npy")
            np.testing.assert_allclose(mean, full.mean(), rtol=1e-5)
        # the two processes loaded disjoint halves
        s0 = np.load(tmp_path / "slice_0.npy")
        s1 = np.load(tmp_path / "slice_1.npy")
        assert s0.tolist() == [0, 12] and s1.tolist() == [12, 24]
        # process-parallel animation: process 0 muxed the gathered clip
        clip = tmp_path / "clip.mp4"
        assert clip.exists() and clip.stat().st_size > 0

"""Multi-host (DCN) path: 2-process CPU fake cluster + in-jit stats reductions.

SURVEY.md §4(e): the reference is single-process and cannot provide distributed
tests; we simulate a 2-host pod with two local processes of 4 virtual CPU
devices each (tools/fake_cluster_worker.py), wired together through
jax.distributed. The in-process tests below cover the same helpers on this
process's virtual 8-device mesh.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_fake_cluster():
    """Full jax.distributed handshake: 2 processes x 4 devices, global mesh,
    make_array_from_process_local_data batching, psum'd convergence stats."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "fake_cluster_worker.py"),
         str(port), str(pid), "2"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("fake cluster timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"worker {pid}/2: OK" in out, out[-3000:]
        assert "global_devices=8" in out and "rate=1.0" in out


class TestInJitStats:
    def _small_solution(self):
        import __graft_entry__ as ge
        import jax

        from hilo_mpc_tpu.parallel import (make_mesh, shard_batch,
                                           sharded_solve_fn)

        nmpc = ge._build_nmpc(N=4, tol=1e-6, max_iter=12)
        mesh = make_mesh(8)
        args = shard_batch(ge._batch_inputs(nmpc, 16), mesh)
        fn = sharded_solve_fn(nmpc, mesh, with_stats=True)
        sol, stats = fn(*args)
        jax.block_until_ready(stats["rate"])
        return sol, stats

    def test_stats_computed_inside_jit_match_host(self):
        from hilo_mpc_tpu.parallel import convergence_stats

        sol, stats = self._small_solution()
        host = convergence_stats(sol)
        assert int(stats["n_converged"]) == host["n_converged"]
        assert float(stats["rate"]) == pytest.approx(host["rate"])
        np.testing.assert_allclose(float(stats["kkt_max"]), host["kkt_max"],
                                   rtol=1e-6)
        np.testing.assert_allclose(float(stats["iterations_p50"]),
                                   host["iterations_p50"])

    def test_batch_stats_is_traceable(self):
        """batch_stats must be pure jnp (usable inside jit/sharded programs)."""
        import jax

        from hilo_mpc_tpu.parallel import batch_stats

        sol, _ = self._small_solution()
        stats = jax.jit(batch_stats)(sol)
        assert float(stats["rate"]) == 1.0


class TestDistributedHelpers:
    def test_local_slice_single_process(self):
        from hilo_mpc_tpu.parallel import distributed as dist

        assert dist.local_slice(16) == slice(0, 16)

    def test_local_slice_two_process(self, monkeypatch):
        import jax

        from hilo_mpc_tpu.parallel import distributed as dist

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        assert dist.local_slice(16) == slice(8, 16)
        with pytest.raises(ValueError, match="divisible"):
            dist.local_slice(17)

    def test_global_mesh_and_batch_single_process(self):
        import jax

        from hilo_mpc_tpu.parallel import distributed as dist

        mesh = dist.global_mesh()
        assert mesh.devices.size == len(jax.devices())
        x = np.arange(32, dtype=np.float64).reshape(16, 2)
        gx = dist.global_batch(x, mesh)
        assert gx.shape == (16, 2)
        np.testing.assert_allclose(np.asarray(gx), x)

    def test_is_multi_process_false_here(self):
        from hilo_mpc_tpu.parallel import distributed as dist

        assert dist.is_multi_process() is False

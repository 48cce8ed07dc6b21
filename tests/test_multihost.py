"""Multi-process distributed-runtime proof (VERDICT r3 next #3).

SURVEY.md §2.4/§5 name `jax.distributed.initialize` as the DCN/multi-host
communication backend; PARITY claims multi-host "needs no code change". This
test demonstrates it as a mechanism fact: two OS processes, each with 4
virtual CPU devices, initialize the distributed runtime, build the global
8-device mesh, and run the FULL sharded deferred-accept LM loop
(`solve_ba_sharded`) with psums crossing the process boundary — then the
result must match the single-process single-device solve.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from textslam_tpu.solver import ba
from test_solver_ba import make_ba_problem

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestMultiProcessCollectives:
    def test_two_process_solve_matches_single(self, tmp_path):
        port = _free_port()
        out = str(tmp_path / "mp_result.npz")
        env = dict(os.environ)
        # the workers configure their own platform/device-count; drop the
        # parent suite's 8-device flag so each contributes exactly 4
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_NUM_CPU_DEVICES"] = ""  # defensive: no stray overrides
        del env["JAX_NUM_CPU_DEVICES"]
        worker = os.path.join(_HERE, "multihost_worker.py")
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), "2", str(port), out],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for pid in range(2)
        ]
        logs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("multi-process workers timed out")
            logs.append(stdout.decode(errors="replace"))
        for pid, (p, log) in enumerate(zip(procs, logs)):
            assert p.returncode == 0, (
                f"worker {pid} failed (rc={p.returncode}):\n{log[-4000:]}")
        assert os.path.exists(out), f"no result written:\n{logs[0][-4000:]}"

        z = np.load(out)
        # single-process single-device reference on the identical problem
        problem, _, _ = make_ba_problem()
        st = ba.solve_ba(problem, n_iters=6)
        np.testing.assert_allclose(z["poses"], np.asarray(st.poses), atol=1e-5)
        np.testing.assert_allclose(z["rho"], np.asarray(st.rho),
                                   rtol=1e-4, atol=1e-6)
        assert abs(float(z["cost"]) - float(st.cost)) <= 1e-3 * max(
            1.0, float(st.cost))

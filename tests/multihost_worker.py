"""Worker process for the multi-host collective proof (VERDICT r3 next #3).

Each OS process initializes the JAX distributed runtime
(`jax.distributed.initialize`, the mechanism SURVEY.md §2.4/§5 names for the
DCN/multi-host comm backend), contributes 4 virtual CPU devices, builds the
GLOBAL 2-process mesh, and runs the full sharded LM loop
(`parallel.ba_sharded.solve_ba_sharded`) — psums cross the process boundary
through the coordination service. Process 0 writes the result for the parent
test to compare against the single-process solve.

Run: python multihost_worker.py <process_id> <num_processes> <port> <out.npz>
(env must NOT pre-initialize jax before distributed.initialize)
"""

import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    # the XLA:CPU client is single-process unless a cross-process collectives
    # transport is selected; gloo ships in jaxlib
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root for textslam_tpu
    from test_solver_ba import make_ba_problem
    from textslam_tpu.parallel import ba_sharded

    # the GLOBAL mesh: devices of BOTH processes on one axis, so every psum
    # in the sharded solver crosses the process boundary
    mesh = Mesh(np.array(jax.devices()), ("data",))

    problem, _, _ = make_ba_problem()

    # every leaf becomes a fully-replicated GLOBAL array (each process holds
    # the identical full value; shard_map's in_specs slice it per device)
    rep = NamedSharding(mesh, P())

    def repl(x):
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, rep, lambda idx: a[idx])

    problem = jax.tree.map(repl, problem)

    st = ba_sharded.solve_ba_sharded(problem, mesh, n_iters=6)
    poses = np.asarray(st.poses)
    rho = np.asarray(st.rho)
    cost = float(st.cost)

    if pid == 0:
        tmp = out_path + ".tmp.npz"
        np.savez(tmp, poses=poses, rho=rho, cost=np.asarray(cost))
        os.replace(tmp, out_path)
    # all processes must reach shutdown together (collective teardown)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Worker process for the multi-host collective proof (VERDICT r3 next #3,
widened to text rows in round 5 — VERDICT r4 next #7).

Each OS process initializes the JAX distributed runtime
(`jax.distributed.initialize`, the mechanism SURVEY.md §2.4/§5 names for the
DCN/multi-host comm backend), contributes 4 virtual CPU devices, builds the
GLOBAL 2-process mesh, and runs BOTH:
  1. ONE normal-equation assembly (`sharded_*_normal_eqs`) — the psums cross
     the process boundary and the result is compared TIGHTLY against the
     single-process assembly (pure collective correctness, no LM path
     sensitivity);
  2. the full sharded deferred-accept LM loop (`solve_ba_sharded`) — whose
     final cost the parent compares with a path-insensitive tolerance (an
     iterative accept/reject schedule across different collective
     implementations may legitimately flip a step on reduction-order ULPs;
     VERDICT r4 weak #7).
Process 0 writes the results for the parent test.

Run: python multihost_worker.py <pid> <nproc> <port> <out.npz> <mode>
mode: "scene" (scene-only problem) or "text" (joint point+text problem —
the TextObs static `level` field and replicated image stack cross the
process boundary too).
"""

import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "scene"
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
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root for textslam_tpu
    from textslam_tpu.parallel import ba_sharded

    # the GLOBAL mesh: devices of BOTH processes on one axis, so every psum
    # in the sharded solver crosses the process boundary
    mesh = Mesh(np.array(jax.devices()), ("data",))

    if mode == "text":
        from __graft_entry__ import _synthetic_problem

        problem = _synthetic_problem(n_kf=4, n_pts=128, obs_per_kf=64,
                                     n_text=4, text_feat=8, img_hw=(96, 128),
                                     with_text=True, seed=5)
    else:
        from test_solver_ba import make_ba_problem

        problem, _, _ = make_ba_problem()

    # every leaf becomes a fully-replicated GLOBAL array (each process holds
    # the identical full value; shard_map's in_specs slice it per device)
    rep = NamedSharding(mesh, P())

    def repl(x):
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, rep, lambda idx: a[idx])

    problem = jax.tree.map(repl, problem)

    # (1) single assembly: tight cross-process psum correctness evidence
    Hcc, bc, _, Hll, bl, cost0 = ba_sharded.sharded_scene_normal_eqs(
        problem, mesh, 2.447)
    Hcc, bc, cost0 = np.asarray(Hcc), np.asarray(bc), float(cost0)
    Hll_d = np.asarray(Hll)[:, 0, 0]
    bl_d = np.asarray(bl)[:, 0]
    if problem.text is not None:
        H2, b2, _, Ht, bt, cost_t = ba_sharded.sharded_text_normal_eqs(
            problem, mesh, 3.0)
        Hcc = Hcc + np.asarray(H2)
        bc = bc + np.asarray(b2)
        cost0 += float(cost_t)

    # (2) the full sharded LM loop
    st = ba_sharded.solve_ba_sharded(problem, mesh, n_iters=6)
    poses = np.asarray(st.poses)
    rho = np.asarray(st.rho)
    theta = np.asarray(st.theta)
    cost = float(st.cost)

    if pid == 0:
        tmp = out_path + ".tmp.npz"
        np.savez(tmp, poses=poses, rho=rho, theta=theta,
                 cost=np.asarray(cost), Hcc=Hcc, bc=bc, Hll_d=Hll_d,
                 bl_d=bl_d, cost0=np.asarray(cost0))
        os.replace(tmp, out_path)
    # all processes must reach shutdown together (collective teardown)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

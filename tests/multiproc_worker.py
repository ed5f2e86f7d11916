"""Worker process for tests/test_multiprocess.py.

Runs as one of N real OS processes: bootstraps the JAX multi-controller
runtime via parallel.mesh.distributed_init (the previously-unexercised
jax.distributed passthrough, SURVEY.md §7 step 6), builds a GLOBAL
(pop, tile) mesh spanning every process's devices, runs the sharded GA
block, round-trips a multi-host checkpoint (process-0 gather + barrier),
and prints one JSON result line the parent compares across processes and
against its single-process reference.

Usage: python tests/multiproc_worker.py <pid> <nproc> <port> <outdir>
"""
import json
import os
import sys


def main() -> None:
    pid, nproc, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    # 4 virtual CPU devices per process => an 8-device global mesh at nproc=2.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )

    import jax

    from ggs_tpu.parallel import mesh as mesh_mod

    mesh_mod.distributed_init(f"127.0.0.1:{port}", nproc, pid)

    import numpy as np
    from functools import partial

    from ggs_tpu.config import GAConfig, GenomeConfig
    from ggs_tpu.models import ga, genome
    from ggs_tpu.ops import codec, objective, oracle
    from ggs_tpu.parallel import shard
    from ggs_tpu.utils import checkpoint
    from jax.experimental import multihost_utils

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    H = W = 16
    gnm = GenomeConfig(n_splats=8, min_scale=1.0, max_scale=0.3)
    cfg = GAConfig(pop_size=8, generations=10, elite_k=2)
    mesh = mesh_mod.make_mesh(4, 2, jax.devices())
    obj_s = shard.sharded_objective(objective.Objective(H=H, W=W, impl="xla"), mesh)

    # Build target + initial state INSIDE one jit with global out_shardings:
    # every process traces identical constants, so the global arrays are
    # consistent without any host-side cross-process placement.
    state_shardings = ga.GAState(
        pop=mesh_mod.pop_sharding(mesh),
        fits=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh_mod.POP_AXIS)
        ),
        best=mesh_mod.replicated(mesh),
        best_fit=mesh_mod.replicated(mesh),
        no_improve=mesh_mod.replicated(mesh),
        key=mesh_mod.replicated(mesh),
        gen=mesh_mod.replicated(mesh),
    )

    @partial(jax.jit, out_shardings=(state_shardings, mesh_mod.target_sharding(mesh)))
    def build():
        tg = genome.new_population(
            jax.random.PRNGKey(2001), 1, 8, H, W, gnm.min_scale, gnm.max_scale
        )[0]
        target = oracle.render_xla(codec.genome_to_renderer(tg), H, W)
        st = ga.init(jax.random.PRNGKey(0), obj_s, target, None, cfg, gnm)
        return st, target

    st, target = build()
    run = ga.make_run_block(obj_s, cfg, gnm)
    st5, _ = run(st, target, None, 5)

    # Multi-host checkpoint: allgather shards, process 0 writes, barrier.
    ckpt = os.path.join(outdir, "mp_ckpt.npz")
    checkpoint.save_checkpoint_distributed(ckpt, st5, {"gen": 5})
    host_state, meta = checkpoint.load_checkpoint(ckpt, st5)
    assert meta["gen"] == 5
    resumed = shard.place_ga_state(host_state, mesh)
    st8, _ = run(resumed, target, None, 3)

    pop_full = np.asarray(multihost_utils.process_allgather(st8.pop, tiled=True))
    fits_full = np.asarray(multihost_utils.process_allgather(st8.fits, tiled=True))
    result = {
        "pid": pid,
        "process_count": jax.process_count(),
        "best_fit": float(np.asarray(st8.best_fit)),
        "fits": fits_full.tolist(),
        "pop_sum": float(pop_full.sum()),
        "gen": int(np.asarray(st8.gen)),
    }
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

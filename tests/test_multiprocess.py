"""Real multi-process execution (SURVEY.md §7 step 6, VERDICT round-1 gap):
two OS processes bootstrap jax.distributed via parallel.mesh.distributed_init,
build one GLOBAL (pop=4, tile=2) mesh over 2x4 virtual CPU devices, run the
sharded GA block, and round-trip a multi-host checkpoint
(utils.checkpoint.save_checkpoint_distributed: allgather + process-0 write +
barrier). The parent asserts both processes agree with each other AND with
the single-process 8-device trajectory of tests/test_sharding.py's config —
i.e. process bootstrap changes nothing but the runtime topology.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_ga_matches_single_process(tmp_path):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    # Strip the axon plugin path: it registers a TPU backend that ignores
    # JAX_PLATFORMS=cpu and would leave each worker single-process.
    inherited = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([_REPO] + inherited)
    worker = os.path.join(_REPO, "tests", "multiproc_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\nSTDOUT:{out}\nSTDERR:{err[-4000:]}"
        outs.append((out, err))

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))

    # Both processes saw the 2-process global runtime and agree exactly.
    for r in results:
        assert r["process_count"] == 2
        assert r["gen"] == 8
    assert results[0]["best_fit"] == results[1]["best_fit"]
    np.testing.assert_array_equal(results[0]["fits"], results[1]["fits"])
    assert results[0]["pop_sum"] == results[1]["pop_sum"]

    # Single-process reference: same seeds/config on the 8-virtual-device
    # mesh, same 5-gens -> checkpoint round-trip -> 3-gens protocol.
    import jax

    from ggs_tpu.config import GAConfig, GenomeConfig
    from ggs_tpu.models import ga, genome
    from ggs_tpu.ops import codec, objective, oracle
    from ggs_tpu.parallel import mesh as mesh_mod
    from ggs_tpu.parallel import shard
    from ggs_tpu.utils import checkpoint
    from conftest import cpu_devices

    H = W = 16
    gnm = GenomeConfig(n_splats=8, min_scale=1.0, max_scale=0.3)
    cfg = GAConfig(pop_size=8, generations=10, elite_k=2)
    mesh = mesh_mod.make_mesh(4, 2, cpu_devices(8))
    obj_s = shard.sharded_objective(objective.Objective(H=H, W=W, impl="xla"), mesh)

    tg = genome.new_population(
        jax.random.PRNGKey(2001), 1, 8, H, W, gnm.min_scale, gnm.max_scale
    )[0]
    target = oracle.render_xla(codec.genome_to_renderer(tg), H, W)
    st = ga.init(jax.random.PRNGKey(0), obj_s, target, None, cfg, gnm)
    st = shard.place_ga_state(st, mesh)
    target_s = shard.place_target(target, mesh)
    run = ga.make_run_block(obj_s, cfg, gnm)
    st5, _ = run(st, target_s, None, 5)
    ck = tmp_path / "ref_ckpt.npz"
    checkpoint.save_checkpoint_distributed(str(ck), st5, {"gen": 5})
    host_state, _ = checkpoint.load_checkpoint(str(ck), st5)
    st8, _ = run(shard.place_ga_state(host_state, mesh), target_s, None, 3)

    np.testing.assert_allclose(
        np.asarray(results[0]["fits"]), np.asarray(st8.fits), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        results[0]["best_fit"], float(np.asarray(st8.best_fit)), rtol=2e-5
    )
    np.testing.assert_allclose(
        results[0]["pop_sum"], float(np.asarray(st8.pop).sum()), rtol=2e-5
    )

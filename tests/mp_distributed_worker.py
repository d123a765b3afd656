"""Worker for the 2-process ``jax.distributed`` test.

Each process: 4 virtual CPU devices, rendezvous at the coordinator via
``runtime.mesh.initialize_runtime`` (the replacement for the reference's
entire rendezvous zoo, ``mps/distributed.py:21-196``), build the GLOBAL
8-device mesh, run one sharded k-means train step + one BatchGreedySelector
step over it, and write the resulting state to a JSON the test compares
across processes. Run by
``test_multiprocess_distributed.py::test_two_process_rendezvous``.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
from pathlib import Path


def main() -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    coordinator, pid, outdir = sys.argv[1], int(sys.argv[2]), Path(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
        # XLA:CPU aborts the process when a collective rendezvous stalls
        # ~30 s; two 4-device processes on a contended 1-core host can
        # legitimately take that long to all arrive (same stretch as
        # __graft_entry__.dryrun_multichip)
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    ).strip()

    import numpy as np

    import jax

    try:  # the environment's TPU plugin can override JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from acav100m_tpu.runtime.mesh import get_mesh, initialize_runtime

    # the actual multi-HOST path the reference exercises with every spawn
    initialize_runtime(coordinator_address=coordinator, num_processes=2,
                       process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = get_mesh()  # global mesh spanning both processes
    assert mesh.shape["data"] == 8

    # -- one sharded k-means train step (stage 5) -------------------------
    from acav100m_tpu.ops import kmeans

    m, k, dmax, b = 4, 8, 16, 16
    state = kmeans.init_state(jax.random.PRNGKey(0), [dmax] * m, k, dmax)
    step = kmeans.make_sharded_train_step(mesh)
    batch_np = np.random.RandomState(0).randn(m, b, dmax).astype(np.float32)
    # identical host value on every process; device_put fills each
    # process's addressable shards of the global array
    batch = jax.device_put(
        batch_np, NamedSharding(mesh, P(None, "data", None)))
    state, _ = step(state, batch, jnp.float32(0.01), jax.random.PRNGKey(1))
    # shard_map out_specs=(P(), P()) -> replicated: fetchable per process
    centers = np.asarray(jax.device_get(state.centers))
    counts = np.asarray(jax.device_get(state.counts))

    # -- one BatchGreedySelector step (stage 6), candidates sharded -------
    from acav100m_tpu.ops import mi
    from acav100m_tpu.ops.pairing import get_cluster_pairing

    rng = np.random.RandomState(0)
    assignments = rng.randint(0, k, (64, m))
    pairs = get_cluster_pairing([("v", f"l{i}") for i in range(m)],
                                "combination")
    sel = mi.BatchGreedySelector(
        assignments, pairs, ncentroids=k, batch_size=16, selection_size=4,
        seed=0, mesh=mesh)
    rep = NamedSharding(mesh, P())
    # re-jit with replicated outputs so every process can fetch them (the
    # plain jit leaves output shardings to XLA, which may keep them
    # sharded across processes); jit-of-jit inlines the inner jit
    step_rep = jax.jit(sel._step, out_shardings=rep)
    ids = jnp.asarray(sel.candidate_ids[:16])
    valid = jnp.ones((16,), bool)
    new_cache, new_stats, top_idx, top_scores = step_rep(
        sel.cache, sel.stats, sel.pairs_all, ids, valid)
    top_idx = np.asarray(jax.device_get(top_idx))
    top_scores = np.asarray(jax.device_get(top_scores))
    cache_n = float(np.asarray(jax.device_get(new_cache["N"])).sum())

    out = {
        "process_id": pid,
        "process_count": int(jax.process_count()),
        "global_devices": len(jax.devices()),
        "centers_sha": hashlib.sha256(
            centers.astype(np.float32).tobytes()).hexdigest(),
        "counts": counts.astype(int).tolist(),
        "kmeans_count": int(jax.device_get(state.count)),
        "select_top_idx": top_idx.astype(int).tolist(),
        "select_top_scores": [round(float(s), 6) for s in top_scores],
        "select_cache_n": cache_n,
    }
    (outdir / f"result_{pid}.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()

"""End-of-round benchmark: curation compute-path throughput on one chip.

Measures the extract -> cluster -> select path in clips/sec/chip on real
shapes (32x256x256 frames + 10 s of 16 kHz audio per clip), i.e. the
device-side cost per curated clip:

    t_clip = t_extract + epochs * t_kmeans_train + t_kmeans_assign
             + t_mi_select      (all amortized per clip)

Baseline: the reference publishes NO throughput numbers (BASELINE.md). The
driver's north star is >=5x the reference GPU pipeline; we anchor
``vs_baseline`` to an estimated 16 clips/sec/GPU for the reference's
decode-bound extract->cluster->select path, i.e. vs_baseline = value / 80
means 1.0 == the 5x target.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_CLIPS_PER_SEC_GPU = 16.0
TARGET_MULTIPLIER = 5.0
BASELINE_VALUE = REFERENCE_CLIPS_PER_SEC_GPU * TARGET_MULTIPLIER


def _sync(out):
    """Force completion with a tiny host fetch.

    NB: on the tunneled 'axon' TPU platform ``jax.block_until_ready``
    returns before execution finishes; fetching a leaf is the only reliable
    barrier. The fetch is a few KB, so the ~30 ms tunnel round trip is
    amortized over the timed iterations.
    """
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def timeit(fn, *args, warmup=2, iters=8, repeats=3):
    """Best-of-``repeats`` timing: the tunneled device occasionally
    degrades transiently (observed 100x slowdowns that clear on their own);
    external contention only ever makes us slower, so min is the honest
    estimate of the compute path."""
    for _ in range(warmup):
        _sync(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from acav100m_tpu.ops import kmeans, mi
    from acav100m_tpu.ops.pairing import get_cluster_pairing
    from acav100m_tpu.pipeline.feature_extraction import (
        build_models,
        get_config,
        make_extract_fn,
    )

    rng = np.random.RandomState(0)
    batch = 64  # big batches saturate the MXU on the low-channel stages
    num_frames, size, audio_len = 32, 256, 160000

    # -- stage 4: fused SlowFast+VGGish extraction ---------------------------
    # bf16 conv stacks: the production extraction config (features are cast
    # back to fp32 on save; parity runs can set computation.dtype=float32)
    cfg = get_config({"computation.dtype": "bfloat16"})
    models, params = build_models(cfg, key=jax.random.PRNGKey(0))
    extract = make_extract_fn(models)
    frames = jnp.asarray(
        rng.randint(0, 255, (batch, num_frames, size, size, 3)), jnp.uint8
    )
    audio = jnp.asarray(rng.randn(batch, audio_len), jnp.float32)
    valid = jnp.full((batch,), audio_len, jnp.int32)
    t_extract = timeit(lambda: extract(params, frames, audio, valid),
                       iters=10) / batch

    # -- stage 5: fused 10-way k-means (train 2 epochs + assign) -------------
    m, k, dmax = 10, 32, 2304
    kbatch_size = 1024
    state = kmeans.init_state(jax.random.PRNGKey(0), [dmax] * m, k, dmax)
    state = state._replace(count=jnp.asarray(10 * k * 10, jnp.int32))
    kbatch = jnp.asarray(rng.randn(m, kbatch_size, dmax), jnp.float32)
    train_step = jax.jit(
        lambda s, b, key: kmeans.train_step(s, b, 0.01, key)
    )
    key = jax.random.PRNGKey(1)
    t_train = timeit(lambda: train_step(state, kbatch, key)[0].centers) / kbatch_size
    assign = jax.jit(kmeans.assign_step)
    t_assign = timeit(lambda: assign(state, kbatch)) / kbatch_size
    epochs = 2
    t_cluster = epochs * t_train + t_assign

    # -- stage 6: batched greedy MI selection --------------------------------
    v, d, c = 20000, 10, 32
    sel_batch, sel_k = 1024, 205  # |S|=0.2V in V/B rounds => k ~ 0.2*B
    assignments = rng.randint(0, c, (v, d))
    pairs = get_cluster_pairing([("x", f"l{i}") for i in range(d)], "combination")
    selector = mi.BatchGreedySelector(
        assignments, pairs, ncentroids=c, batch_size=sel_batch,
        selection_size=sel_k, keep_unselected=True, seed=0,
    )
    ids = jnp.asarray(selector.candidate_ids[:sel_batch])
    step = selector._step

    def sel_step():
        return step(selector.cache, selector.stats, selector.pairs_all, ids)[0]["N"]

    t_sel_step = timeit(sel_step)
    # selection visits ~V/B batches to pick 0.2V -> per-clip cost = t/B
    t_select = t_sel_step / sel_batch

    t_clip = t_extract + t_cluster + t_select
    value = 1.0 / t_clip
    print(
        json.dumps(
            {
                "metric": "curation clips/sec/chip (extract+cluster+select)",
                "value": round(value, 3),
                "unit": "clips/sec/chip",
                "vs_baseline": round(value / BASELINE_VALUE, 3),
                "detail": {
                    "t_extract_ms": round(t_extract * 1e3, 3),
                    "t_cluster_ms": round(t_cluster * 1e3, 4),
                    "t_select_ms": round(t_select * 1e3, 4),
                    "device": str(jax.devices()[0]),
                    "extract_batch": batch,
                    "extract_dtype": "bfloat16",
                },
            }
        )
    )


if __name__ == "__main__":
    main()

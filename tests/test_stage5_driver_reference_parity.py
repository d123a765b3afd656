"""Executable parity of the FULL stage-5 driver vs the REFERENCE's own
``clustering/code/run_clustering.py``.

Earlier parity work proved the k-means *math* step-for-step
(tests/test_reference_parity.py); this drives the reference's actual
driver end-to-end on CPU torch — epoch-cache resume (``load_clusterings``
→ ``torch.load`` of pickled KMeans objects), the train loop's lr schedule
and ResizedDataset epoch boundaries, and the assign phase's shard
accumulation + ``_save_output`` rows — against the repo's
``pipeline/clustering.py`` driver, from one injected common centroid
state.

Determinism facts this relies on (all executed, not assumed):

* the reference train loader NEVER shuffles — ``get_clustering_dataloader``
  accepts ``shuffle=True`` but builds the DataLoader with shuffle=False and
  never calls ``FeatureDataset.shuffle`` (data/clustering.py:17-67), so the
  training stream is shard order × pkl row order (repo:
  ``computation.shuffle_bufsize=0``);
* warmup (count < 10·k) assigns randomly from torch's global RNG, which
  cannot be unified with jax — both sides resume from an injected epoch
  cache with count = 10·k, exercising the reference's REAL resume path;
* resuming re-trains the cached epoch: ``pre_epochs = cached_epoch``
  (run_clustering.py:142-144) — the repo driver matches this;
* dataset size (16) is a multiple of get_length's batch rounding, so the
  persistent ResizedDataset iterator restarts cleanly at each epoch.

Environment shims (both sides identical or reference-only compat):
``webdataset.ResizedDataset`` faithful stand-in (the reference vendors the
same class at evaluation/code/dataset.py:343-385), ``torch.load`` restored
to its pre-2.6 ``weights_only=False`` default, ``.cuda()`` no-op'd
(sgd_clustering.py:113 hard-calls it).

Reference: ``clustering/code/run_clustering.py:25-272``,
``data/clustering.py``, ``save.py::_save_output``, ``utils.py:30-32``.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import numpy as np
import pytest

from tests import reference_oracle as ro

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="reference not present"
)

K = 4  # ncentroids
COUNT0 = 10 * K  # past warmup
EPOCHS = 2
BATCH = 4
ROWS_PER_SHARD = 8
NUM_SHARDS = 2
SPEC = "shard-{000000..000001}.pkl"

MODELS = {
    "layer_slow_fast": {  # the registry name inflection.underscore produces
        "extractor_name": "SLOWFAST_8x8_R50",
        "dataset": "kinetics-400",
        "dims": [88, 352, 704, 1408, 2304],
    },
    "layer_vggish": {
        "extractor_name": "VGGish",
        "dataset": "YouTube-8M",
        "dims": [64, 128, 256, 512, 128],
    },
}


def all_types():
    return sorted(
        (m, f"layer_{i}")
        for m, info in MODELS.items()
        for i in range(len(info["dims"]))
    )


def type_dim(t):
    return MODELS[t[0]]["dims"][int(t[1].split("_")[-1])]


def build_fixture(root: Path, rng):
    """Feature pkl shards + shard jsons in the stage-4 output schema, with
    cluster-structured features (healthy argmin margins), plus an injected
    past-warmup centroid state per clustering type."""
    root.mkdir(parents=True)
    protos = {t: 2.0 * rng.randn(K, type_dim(t)).astype(np.float32)
              for t in all_types()}
    centers = {t: protos[t] + 0.2 * rng.randn(K, type_dim(t)).astype(np.float32)
               for t in all_types()}
    counts = {t: rng.multinomial(COUNT0, rng.dirichlet(np.ones(K) * 0.6))
                   .astype(np.float32)
              for t in all_types()}
    for s in range(NUM_SHARDS):
        shard_name = f"shard-{s:06d}"
        rows, meta = [], []
        for i in range(ROWS_PER_SHARD):
            fname = f"clip_{s}_{i:03d}.mp4"
            row = {"filename": fname, "shard_name": shard_name,
                   "shard_size": ROWS_PER_SHARD,
                   "video_features": [], "audio_features": []}
            for m, info in MODELS.items():
                arr = {}
                for j, d in enumerate(info["dims"]):
                    c = rng.randint(K)
                    arr[f"layer_{j}"] = (
                        protos[(m, f"layer_{j}")][c]
                        + 0.1 * rng.randn(d).astype(np.float32)
                    )
                feat = {"model_key": m,
                        "extractor_name": info["extractor_name"],
                        "dataset": info["dataset"], "array": arr}
                side = ("audio_features" if m == "layer_vggish"
                        else "video_features")
                row[side].append(feat)
            rows.append(row)
            meta.append({"filename": fname, "id": fname[:-4],
                         "segment": [0.0, 10.0]})
        with open(root / f"{shard_name}.pkl", "wb") as f:
            pickle.dump(rows, f)
        with open(root / f"{shard_name}.json", "w") as f:
            json.dump(meta, f)
    return centers, counts


def canonical_assignments(pkl_paths):
    """{filename: {(model_key, layer): int}} from assignment pkl rows —
    the schema fields both sides share."""
    out = {}
    for p in pkl_paths:
        with open(p, "rb") as f:
            rows = pickle.load(f)
        for row in rows:
            dt = {}
            for side in ("video_assignments", "audio_assignments"):
                for feat in row[side]:
                    for layer, v in feat["array"].items():
                        dt[(feat["model_key"], layer)] = int(v)
            out[row["filename"]] = dt
    return out


def run_reference(data_dir: Path, out_dir: Path, centers, counts):
    rc = ro.import_stage("clustering", ["run_clustering", "sgd_clustering"])
    run, km = rc["run_clustering"], rc["sgd_clustering"]
    out_dir.mkdir(parents=True, exist_ok=True)

    # injected epoch-0 cache: pickled KMeans objects, the production format
    # (save_scheme_ver2 is the dead switch — None -> whole-object pickling)
    clusterings = {}
    for (m, layer) in all_types():
        obj = km.KMeans(args=ro.make_kmeans_args(), d=type_dim((m, layer)),
                        k=K, lr=0.01)
        obj.centers = torch.from_numpy(centers[(m, layer)].copy())
        obj.counts = torch.from_numpy(counts[(m, layer)].copy())
        obj.count = COUNT0
        clusterings.setdefault(m, {})[layer] = obj
    args = ro.make_clustering_args(
        data_dir, out_dir, SPEC, batch_size=BATCH, ncentroids=K,
        epochs=EPOCHS, cached_epoch=0, resume_training=True,
    )
    model_names = list(MODELS)
    with ro.stage_context("clustering"), ro.torch_load_legacy(), \
            ro.patch_cuda():
        # save inside the context too: pickling KMeans resolves the
        # `sgd_clustering` module by import
        torch.save(clusterings, str(out_dir / f"cache_epoch_0_{SPEC}"))
        trained = run.train_clusters(args, model_names)
        saved = run.assign_clusters(args, model_names, trained)
    return trained, [Path(p) for p in saved]


def run_repo(data_dir: Path, out_dir: Path, centers, counts):
    from acav100m_tpu.ops import kmeans as okm
    from acav100m_tpu.pipeline import clustering as pc

    types = all_types()
    dims = [type_dim(t) for t in types]
    dmax = max(dims)
    m = len(types)
    centers_f = np.zeros((m, K, dmax), np.float32)
    counts_f = np.zeros((m, K), np.float32)
    d_mask = np.zeros((m, dmax), np.float32)
    for ti, t in enumerate(types):
        d = type_dim(t)
        centers_f[ti, :, :d] = centers[t]
        counts_f[ti] = counts[t]
        d_mask[ti, :d] = 1.0
    state = okm.KMeansState(
        centers=jnp.asarray(centers_f),
        counts=jnp.asarray(counts_f),
        count=jnp.asarray(COUNT0, jnp.int32),
        fallback=jnp.zeros((), jnp.int32),
        d_mask=jnp.asarray(d_mask),
    )

    cfg = pc.get_config({
        "data.path": str(data_dir / SPEC),
        "data.batch_size": BATCH,
        "data.output.path": str(out_dir),
        "computation.shuffle_bufsize": 0,
        "clustering.ncentroids": K,
        "clustering.epochs": EPOCHS,
        "clustering.cached_epoch": 0,
        "clustering.resume_training": True,
        "clustering.load_cache_from_shard_subset": False,
        "clustering.save_epoch_prefix": True,
    })
    pc.save_centroids(cfg, 0, state, types, dims)
    state2, types2, dims2 = pc.train_clusters(cfg)
    assert [tuple(t) for t in types2] == types
    saved = pc.assign_clusters(cfg, state2, types2)
    return state2, [Path(p) for p in saved]


def test_stage5_driver_parity(tmp_path):
    rng = np.random.RandomState(1234)
    data_dir = tmp_path / "features"
    centers, counts = build_fixture(data_dir, rng)

    ref_out = tmp_path / "ref_out"
    my_out = tmp_path / "my_out"
    trained, ref_saved = run_reference(data_dir, ref_out, centers, counts)
    state2, my_saved = run_repo(data_dir, my_out, centers, counts)

    types = all_types()

    # -- trained centroid state ------------------------------------------------
    expected_count = COUNT0 + EPOCHS * NUM_SHARDS * ROWS_PER_SHARD
    assert int(state2.count) == expected_count
    for ti, (m, layer) in enumerate(types):
        obj = trained[m][layer]
        assert obj.count == expected_count, (m, layer)
        np.testing.assert_array_equal(
            np.asarray(state2.counts)[ti], obj.counts.numpy(),
            err_msg=f"{m}/{layer}",
        )
        d = type_dim((m, layer))
        np.testing.assert_allclose(
            np.asarray(state2.centers)[ti, :, :d], obj.centers.numpy(),
            rtol=1e-4, atol=1e-5, err_msg=f"{m}/{layer}",
        )
        assert int(state2.fallback) == obj.fallback == 0

    # -- artifact names: epoch caches + prefixed assignment shards -------------
    ref_caches = sorted(p.name for p in ref_out.glob("cache_epoch_*"))
    my_caches = sorted(p.name for p in my_out.glob("cache_epoch_*"))
    assert ref_caches == my_caches == [
        f"cache_epoch_0_{SPEC}", f"cache_epoch_1_{SPEC}"
    ]
    assert sorted(p.name for p in ref_saved) == sorted(
        p.name for p in my_saved
    ) == ["epoch_0_shard-000000.pkl", "epoch_0_shard-000001.pkl"]

    # -- assignments ------------------------------------------------------------
    ref_asn = canonical_assignments(ref_saved)
    my_asn = canonical_assignments(my_saved)
    assert set(ref_asn) == set(my_asn) and len(ref_asn) == 16
    assert ref_asn == my_asn

    # sanity: training moved the centers and used more than one cluster
    moved = np.abs(
        np.asarray(state2.centers)[0, :, : type_dim(types[0])]
        - centers[types[0]]
    ).max()
    assert moved > 1e-4
    assert len({v for dt in my_asn.values() for v in dt.values()}) > 1

"""Stage 5-6 end-to-end: byte-identical ``output.csv`` vs the reference.

The north-star clause that is falsifiable in this image: one synthetic
assignment-shard set -> the reference's own ``subset_selection/code/run.py``
(CPU torch, f64-lifted) and the repo's ``pipeline.subset_selection`` (x64
parity mode) -> the SAME ``output.csv``, byte for byte, including the
manifest partitioning and the shard-json metadata join.

RNG unification: the reference shuffles its candidate pool with
``torch.randperm`` every round; the repo with ``numpy`` — both are swapped
to the same seeded numpy permutation stream (``reference_oracle.
unified_shuffles``), which changes neither algorithm. Assignments are the
engineered fixture from ``tests/gen_parity_fixtures.py`` (every greedy
round's k-boundary margin is macroscopic — re-asserted here), because
torch breaks EXACT score ties arbitrarily, which no reimplementation can
reproduce.

Also covers the clustering->selection chain: the same synthetic features
are clustered by the reference's KMeans and the repo's ops.kmeans from an
injected common init, producing identical assignment pkls, before selection
runs on each side's own clustering output.
"""

from __future__ import annotations

import contextlib
import io
import json
import pickle
from pathlib import Path

import numpy as np
import pytest

from tests import reference_oracle as ro

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="/root/reference not present"
)

MODELS = [("slowfast", "video"), ("vggish", "audio")]
FIXTURE = Path(__file__).parent / "data" / "e2e_parity_assignments.npy"


def build_dataset(root: Path, A: np.ndarray, v_per_shard: int = 100):
    """Assignment pkl shards + shard-meta jsons + one run manifest, in the
    stage-5 output schema (reference run_clustering.py:194-211 rows,
    dataloader.py:72-89 partitions, save.py:6-44 meta join)."""
    root.mkdir(parents=True, exist_ok=True)
    (root / "metas").mkdir(exist_ok=True)
    v = A.shape[0]
    shards = []
    for s in range(v // v_per_shard):
        name = f"shard-{s:06d}"
        rows, metas = [], []
        for j in range(v_per_shard):
            gi = s * v_per_shard + j
            fn = f"clip{gi:04d}.mp4"
            row = {
                "filename": fn,
                "shard_name": name,
                "shard_size": v_per_shard,
                "video_assignments": [],
                "audio_assignments": [],
            }
            for mi_, (mk, side) in enumerate(MODELS):
                arr = {f"layer_{l}": int(A[gi, mi_ * 5 + l]) for l in range(5)}
                row[f"{side}_assignments"].append({"model_key": mk, "array": arr})
            rows.append(row)
            metas.append({
                "filename": fn,
                "id": f"vid{gi:04d}",
                "segment": [float(gi), float(gi) + 10.0],
            })
        p = root / f"{name}.pkl"
        with open(p, "wb") as f:
            pickle.dump(rows, f)
        with open(root / "metas" / f"{name}.json", "w") as f:
            json.dump(metas, f)
        shards.append(p)
    with open(root / "log_host_1_1700000000.json", "w") as f:
        json.dump({"shards": [p.stem for p in shards]}, f)
    return shards, root / "metas"


def run_reference_selection(sel, shards, metas_dir, out, shufseed):
    args = ro.make_selection_args(
        data={
            "path": [str(p) for p in shards],
            "output": {"path": Path(out)},
            "meta": {"path": Path(metas_dir)},
        },
    )
    M = sel["measures"].get_measure("batch_mi")
    with ro.f64_measures(sel["measures"].mi), ro.unified_shuffles(M, shufseed), \
            contextlib.redirect_stdout(io.StringIO()):
        sel["run"].run_single(args)


def run_repo_selection(shards, metas_dir, out, shufseed):
    from acav100m_tpu.pipeline import subset_selection as ss

    cfg = ss.get_config({
        "data": {
            "path": [str(p) for p in shards],
            "output": {"path": str(out)},
            "meta": {"path": str(metas_dir)},
        },
        "computation": {"random_seed": shufseed, "dtype": "float64"},
        "shuffle_candidates": False,
    })
    ss.run_single(cfg)


def test_e2e_output_csv_byte_identical(tmp_path):
    sel = ro.import_stage(
        "subset_selection",
        ["measures", "pairing", "run_greedy", "run", "save", "dataloader"],
    )
    A = np.load(FIXTURE)
    shufseed = 0

    # fixture decisiveness re-check: every round's k-boundary margin must be
    # far above cross-implementation f64 noise, else equality would be luck
    from tests.gen_parity_fixtures import E2E, simulate_batch

    _, rounds = simulate_batch(
        ro, sel, A, shufseed, E2E["subset"], E2E["c"], E2E["batch"], E2E["k"]
    )
    assert min(mm for mm, _ in rounds) > 1e-9

    shards, metas_dir = build_dataset(tmp_path / "data", A)
    run_reference_selection(sel, shards, metas_dir, tmp_path / "ref.csv", shufseed)
    run_repo_selection(shards, metas_dir, tmp_path / "mine.csv", shufseed)

    ref_bytes = (tmp_path / "ref.csv").read_bytes()
    my_bytes = (tmp_path / "mine.csv").read_bytes()
    assert len(ref_bytes) > 0
    assert my_bytes == ref_bytes


def test_clustering_to_selection_chain(tmp_path):
    """Stage 5 -> 6 chain: identical feature stream through the reference
    KMeans and the repo's fused k-means (common injected init, past warmup)
    -> identical assignment ints -> identical selection input."""
    import torch

    import jax.numpy as jnp

    from acav100m_tpu.ops import kmeans as okm

    km_mod = ro.clustering_modules()["sgd_clustering"]
    sel = ro.subset_selection_modules()

    rng = np.random.RandomState(1)
    v, d_feat, k = 200, 24, 8
    # class-structured features so assignments are meaningful
    protos = rng.randn(6, d_feat).astype(np.float32)
    feats = (
        protos[rng.randint(0, 6, size=v)] + 0.1 * rng.randn(v, d_feat)
    ).astype(np.float32)

    centers0 = (rng.rand(k, d_feat) * 1e-5).astype(np.float32)
    lr = 0.01

    ref = km_mod.KMeans(args=ro.make_kmeans_args(), d=d_feat, k=k, lr=lr)
    ref.centers = torch.from_numpy(centers0.copy())
    ref.counts = torch.zeros(k)
    ref.count = 10 * k

    state = okm.KMeansState(
        centers=jnp.asarray(centers0)[None],
        counts=jnp.zeros((1, k), dtype=jnp.float32),
        count=jnp.asarray(10 * k, dtype=jnp.int32),
        fallback=jnp.zeros((), dtype=jnp.int32),
        d_mask=jnp.ones((1, d_feat), dtype=jnp.float32),
    )

    with ro.patch_cuda():
        for i in range(0, v, 50):  # train epoch
            batch = feats[i : i + 50]
            ref.add(torch.from_numpy(batch.copy()))
            state, _ = okm.train_step(state, jnp.asarray(batch)[None], lr)
        ref_assign = []
        for i in range(0, v, 50):  # assign pass
            best, _ = ref.calc_best(torch.from_numpy(feats[i : i + 50].copy()))
            ref_assign.append(best.numpy())
    ref_assign = np.concatenate(ref_assign)
    my_assign = np.asarray(okm.assign_step(state, jnp.asarray(feats)[None]))[0]
    np.testing.assert_array_equal(my_assign, ref_assign)

"""Executable parity of the CHUNKED stage-6 driver + reduce vs the
reference's own ``subset_selection/code/chunk.py`` (round-3 VERDICT
missing #4).

The reference's ``run_chunks`` is driven end-to-end in-process: real
``get_chunks`` shard chunking, the per-chunk ``subset.size = ceil(S /
num_chunks)`` rule (chunk.py:45-46), the real per-chunk ``_run`` →
``run_greedy`` selection, per-chunk cache csvs written by
``_reduce_single_cache``/``save_output`` into ``caches/`` with the
``cache_{pid}_{rank}_{i}_`` prefix, and the ``Cli.reduce`` merge
(``save.merge_all_csvs``: glob + pid-group + sorted concat into
output.csv). Only the process fabric is shimmed: ``mp.spawn`` runs
``run_chunks_node(0, cfg)`` inline (1 "GPU"), exactly the degenerate
single-process layout the reference itself uses on one GPU.

RNG unification: the repo's chunked driver reseeds its shuffle rng per
partition (pipeline/subset_selection.py::run_greedy_partition), so the
reference's torch shuffle is swapped for a PER-INSTANCE numpy stream
(``reference_oracle.unified_shuffles_per_instance``) — each chunk's fresh
measure gets a fresh RandomState(seed), same as the repo. Assignments are
an engineered fixture (tests/gen_parity_fixtures.py::engineer_chunked):
every round of BOTH chunks has a macroscopic k-boundary margin,
re-asserted at run time.

Parity claims:

* identical per-chunk SELECTION TRAJECTORIES: same (shard_name, filename)
  rows in the same order in each chunk's cache csv (names differ only by
  each run's pid, normalized);
* identical merged ``output.csv`` row sequences (same normalization);
* the ceil rule: 20 rows per chunk from subset.size=40 over 2 chunks.

TWO reference bugs pinned by execution (deliberate repo divergences,
PARITY.md):

* **chunked meta join is broken upstream**: ``_reduce_single_cache``
  flattens metas to ``{filename: meta}`` (chunk.py:96) but passes them to
  ``save_output`` with its default ``sharded_meta=True``, whose
  ``metas[shard_name]`` lookup then ALWAYS misses — every chunked row is
  written with ``id=-1, segment=[-1.0,-1.0]`` (save.py:14-27). The test
  asserts the reference really does this and that the repo performs the
  correct join (real ids/segments) — the repo intentionally does NOT
  reproduce the data-destroying bug;
* ``_reduce_single_cache`` truncates ``res[:args.subset_size]`` — but
  ``subset_size`` (underscore) is never a config key, DefaultMunch yields
  None, and ``res[:None]`` is the whole list: dead code (chunk.py:98-99).

Reference: ``subset_selection/code/chunk.py:21-152``, ``cli.py:69-78``,
``save.py:85-122``.
"""

from __future__ import annotations

import contextlib
import io
import json
import math
import pickle
import types
from pathlib import Path

import numpy as np
import pytest

from tests import reference_oracle as ro
from tests.test_reference_e2e import build_dataset

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="/root/reference not present"
)

FIXTURE = Path(__file__).parent / "data" / "chunked_parity_assignments.npy"
SUBSET_SIZE = 40  # -> ceil(40/2) = 20 per chunk (chunk.py:45-46)
SHUFSEED = 0


def _sel():
    return ro.import_stage(
        "subset_selection",
        ["measures", "pairing", "run_greedy", "run", "save", "dataloader",
         "utils", "chunk"],
    )


def run_reference_chunked(sel, data_root: Path, metas_dir: Path,
                          out_csv: Path):
    chunk_mod = sel["chunk"]
    args = ro.make_selection_args(
        data={
            "path": str(data_root / "shard-{000000..000001}.pkl"),
            "output": {"path": Path(out_csv)},
            "meta": {"path": Path(metas_dir)},
        },
        chunk_size=1,
        save_cache_as_csvs=True,
        computation={"num_gpus": 1, "num_workers": 1, "load_async": False},
        subset={"size": SUBSET_SIZE},
    )

    orig_spawn = chunk_mod.spawn
    orig_mp = chunk_mod.mp

    def inline_spawn(func, args_, cfg):
        func(0, cfg)  # the reference's 1-GPU layout, without the process

    chunk_mod.spawn = inline_spawn
    chunk_mod.mp = types.SimpleNamespace(set_start_method=lambda *a, **k: None)
    M = sel["measures"].get_measure("batch_mi")
    try:
        with ro.f64_measures(sel["measures"].mi), \
                ro.unified_shuffles_per_instance(M, SHUFSEED), \
                contextlib.redirect_stdout(io.StringIO()), \
                ro.stage_context("subset_selection"):
            chunk_mod.run_chunks(args)
            # Cli.reduce with save_cache_as_csvs=True (cli.py:69-75)
            sel["save"].merge_all_csvs(args)
    finally:
        chunk_mod.spawn = orig_spawn
        chunk_mod.mp = orig_mp
    return args


def run_repo_chunked(data_root: Path, metas_dir: Path, out_csv: Path):
    from acav100m_tpu.pipeline import subset_selection as ss

    cfg = ss.get_config({
        "data": {
            "path": str(data_root / "shard-{000000..000001}.pkl"),
            "output": {"path": str(out_csv)},
            "meta": {"path": str(metas_dir)},
        },
        "chunk_size": 1,
        "subset.size": SUBSET_SIZE,
        "computation": {"random_seed": SHUFSEED, "dtype": "float64"},
        "shuffle_candidates": False,
    })
    return ss.run_chunks(cfg)


def cache_csvs(out_csv: Path):
    caches = sorted((out_csv.parent / "caches").glob("cache_*_*_*"))
    # strip the run-pid from the name: cache_{pid}_{rank}_{i}_{name}
    keyed = {}
    for p in caches:
        parts = p.name.split("_")
        keyed[("_".join([parts[0]] + parts[2:]))] = p.read_text()
    return keyed


def parse_rows(text: str):
    """csv rows -> [(shard_name, filename, id, segment)]."""
    import csv as _csv

    return [tuple(row) for row in _csv.reader(io.StringIO(text))]


@pytest.mark.slow
def test_chunked_driver_and_reduce_parity(tmp_path):
    sel = _sel()
    A = np.load(FIXTURE)

    # fixture decisiveness re-check per chunk (self-validating comparison)
    from tests.gen_parity_fixtures import CHUNK, simulate_batch

    vpc = CHUNK["v_per_chunk"]
    for ci in range(CHUNK["chunks"]):
        _, rounds = simulate_batch(
            ro, sel, A[ci * vpc:(ci + 1) * vpc], SHUFSEED,
            CHUNK["per_chunk_subset"], CHUNK["c"], CHUNK["batch"],
            CHUNK["k"])
        assert min(mm for mm, _ in rounds) > 1e-9, f"chunk {ci} not decisive"

    ref_root = tmp_path / "ref"
    my_root = tmp_path / "mine"
    shards_ref, metas_ref = build_dataset(ref_root / "data", A, v_per_shard=vpc)
    shards_my, metas_my = build_dataset(my_root / "data", A, v_per_shard=vpc)

    ref_out = ref_root / "out" / "output.csv"
    my_out = my_root / "out" / "output.csv"
    ref_out.parent.mkdir(parents=True)
    my_out.parent.mkdir(parents=True)

    run_reference_chunked(sel, ref_root / "data", metas_ref, ref_out)
    run_repo_chunked(my_root / "data", metas_my, my_out)

    # per-chunk cache csvs: same set (modulo run pid), same trajectories
    ref_caches = cache_csvs(ref_out)
    my_caches = cache_csvs(my_out)
    assert set(ref_caches) == set(my_caches)
    assert len(ref_caches) == 2  # one per chunk
    for key in sorted(ref_caches):
        ref_rows = parse_rows(ref_caches[key])
        my_rows = parse_rows(my_caches[key])
        # identical selections, identical order
        assert [r[:2] for r in ref_rows] == [r[:2] for r in my_rows], key
        # reference meta-join bug pinned: every chunked row id=-1
        assert all(r[2] == "-1" and r[3] == "[-1.0, -1.0]"
                   for r in ref_rows), key
        # repo performs the real join (deliberate divergence)
        for shard, fname, vid, seg in my_rows:
            gi = int(Path(fname).stem.replace("clip", ""))
            assert vid == f"vid{gi:04d}", (key, fname)
            assert seg == f"[{float(gi)}, {float(gi) + 10.0}]", (key, fname)

    # merged output.csv: identical row sequences modulo the pinned join bug
    ref_rows = parse_rows(ref_out.read_text())
    my_rows = parse_rows(my_out.read_text())
    assert [r[:2] for r in ref_rows] == [r[:2] for r in my_rows]
    assert all(r[2] == "-1" for r in ref_rows)
    assert all(r[2] != "-1" for r in my_rows)
    # 20 rows per chunk: the ceil(S/num_chunks) rule on both sides, minus
    # the start singleton batch_mi never outputs (batch.py:206-207)
    per_chunk = math.ceil(SUBSET_SIZE / 2)
    assert len(ref_rows) == 2 * per_chunk


@pytest.mark.slow
def test_reduce_single_cache_truncation_is_dead_code():
    """Executed quirk pin: chunk.py:98-99 slices ``res[:args.subset_size]``
    but ``subset_size`` (underscore, not ``subset.size``) is never set —
    DefaultMunch/NS yields None and ``res[:None]`` keeps everything."""
    sel = _sel()
    chunk_mod = sel["chunk"]
    args = ro.make_selection_args(subset={"size": 3})
    assert args.subset_size is None
    res = [{"filename": f"f{i}.mp4", "shard_name": "s"} for i in range(7)]
    metas = {"part": {"s": {f"f{i}": {"id": str(i), "segment": [0.0, 1.0]}
                           for i in range(7)}}}
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        args.data.output.path = Path(td) / "output.csv"
        with contextlib.redirect_stdout(io.StringIO()), \
                ro.stage_context("subset_selection"):
            out_path, count = chunk_mod._reduce_single_cache(
                args, "cache_1_0_0", res, metas)
        assert count == 7  # NOT truncated to subset.size=3

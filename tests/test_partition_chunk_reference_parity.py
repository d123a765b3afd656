"""Executable parity for stage-6 partitioning and chunking.

Runs the reference's OWN ``subset_selection/code/dataloader.py`` and
``utils.py`` (pure Python, CPU) as the oracle for the repo's
``pipeline/subset_selection`` loaders:

* multi-partition ``load_data``: run-manifest grouping with overlapping
  logs (newer wins), shards with no manifest (partition -1), and the
  shard-json metadata join -> identical partitioned rows and metas;
* the manifest-ordering quirk, executed not assumed: logs sort by the
  trailing timestamp as a STRING (``dataloader.py:74-76``), so
  ``ts=999`` outranks ``ts=1000`` — both sides pin it;
* ``preprocess`` -> identical V x D assignment matrices, sorted
  clustering types, filenames and shard_names;
* ``get_chunks`` / ``split_chunks`` (``utils.py:77-86``) and chunk
  mode's per-chunk subset size ``ceil(size/num_chunks)``
  (``chunk.py:44-46``) against the repo's chunk runner;
* the reference ``format_row`` list-array path raises (``dataloader.py:
  30-32`` iterates ``range(array)`` on a list) — pinned as executed
  behavior; the repo accepts list arrays (documented divergence).
"""

from __future__ import annotations

import json
import math
import pickle
from pathlib import Path

import numpy as np
import pytest

from tests import reference_oracle as ro

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="/root/reference not present"
)


def _mods():
    return ro.import_stage("subset_selection", ("dataloader", "utils"))


def make_row(gi: int, shard_name: str, rng: np.random.RandomState):
    row = {
        "filename": f"clip{gi:04d}.mp4",
        "shard_name": shard_name,
        "shard_size": 4,
        "video_assignments": [
            {"model_key": "slowfast",
             "array": {f"layer_{l}": int(rng.randint(8)) for l in range(3)}}
        ],
        "audio_assignments": [
            {"model_key": "vggish",
             "array": {f"layer_{l}": int(rng.randint(8)) for l in range(2)}}
        ],
    }
    return row


def build_multi_partition_dataset(root: Path):
    """5 assignment shards + metas + 3 manifests:

    * log ts=1000 claims shards 0,1
    * log ts=999  claims shards 1,2
    * log ts=998  claims shard 3
    * shard 4 appears in no log -> partition -1.

    Timestamps sort as STRINGS: '1000' < '998' < '999', so the log order
    is [1000, 998, 999] and the ts=999 log (index 2) is the "newest" —
    its claim on shard 1 beats the numerically-newer ts=1000 log. The
    fixture makes the quirk load-bearing: numeric-ts ordering would
    assign shard 1 to partition 0 instead.
    """
    root.mkdir(parents=True, exist_ok=True)
    metas_dir = root / "metas"
    metas_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    shard_paths = []
    for s in range(5):
        name = f"shard-{s:06d}"
        rows = [make_row(s * 4 + j, name, rng) for j in range(4)]
        p = root / f"{name}.pkl"
        with open(p, "wb") as f:
            pickle.dump(rows, f)
        metas = [
            {"filename": r["filename"], "id": f"vid{s}_{j}",
             "segment": [float(j), float(j) + 10.0]}
            for j, r in enumerate(rows)
        ]
        with open(metas_dir / f"{name}.json", "w") as f:
            json.dump(metas, f)
        shard_paths.append(p)
    logs = {
        "log_hostA_11_1000.json": ["shard-000000", "shard-000001"],
        "log_hostB_22_999.json": ["shard-000001", "shard-000002"],
        "log_hostC_33_998.json": ["shard-000003"],
    }
    for fname, shards in logs.items():
        with open(root / fname, "w") as f:
            json.dump({"shards": shards}, f)
    return shard_paths, metas_dir


class TestPartitionParity:
    def test_load_partitions_string_ts_order(self, tmp_path):
        from acav100m_tpu.utils.manifests import read_run_manifests

        shard_paths, _ = build_multi_partition_dataset(tmp_path)
        dl = _mods()["dataloader"]
        ref = dl.load_partitions(tmp_path)
        got = read_run_manifests(tmp_path)
        assert ref == got
        # the quirk is load-bearing in this fixture: string sort is
        # '1000' < '998' < '999', so shard 1 belongs to the ts=999 log
        # (index 2), NOT the numerically-newest ts=1000 log (index 0).
        assert ref["shard-000001"] == 2
        assert ref["shard-000000"] == 0
        assert ref["shard-000003"] == 1
        assert "shard-000004" not in ref

    def test_load_data_multi_partition_and_metas(self, tmp_path):
        from acav100m_tpu.pipeline.subset_selection import (
            expand_shard_paths, load_metas, load_partitions_data)

        shard_paths, metas_dir = build_multi_partition_dataset(tmp_path)
        dl = _mods()["dataloader"]
        ref_parts, ref_metas = dl.load_data(
            [str(p) for p in shard_paths], metas_dir, num_workers=1)

        paths = expand_shard_paths([str(p) for p in shard_paths])
        got_parts = load_partitions_data(paths)
        got_metas = load_metas(metas_dir, paths)

        assert set(ref_parts.keys()) == set(got_parts.keys()) == {-1, 0, 1, 2}
        for pid in ref_parts:
            assert ref_parts[pid] == got_parts[pid], pid
        assert set(ref_metas) == set(got_metas)
        for shard, rows in ref_metas.items():
            assert set(rows) == set(got_metas[shard])
            for stem, meta in rows.items():
                assert got_metas[shard][stem]["id"] == meta["id"]
                assert got_metas[shard][stem]["segment"] == meta["segment"]

    def test_load_data_single_partition_fast_path(self, tmp_path):
        """One manifest covering every shard takes dataloader.py:178-184's
        single-partition branch — grouping must still match."""
        from acav100m_tpu.pipeline.subset_selection import (
            expand_shard_paths, load_partitions_data)

        shard_paths, metas_dir = build_multi_partition_dataset(tmp_path)
        for extra in tmp_path.glob("log_*.json"):
            extra.unlink()
        with open(tmp_path / "log_h_1_1700000000.json", "w") as f:
            json.dump({"shards": [p.stem for p in shard_paths]}, f)
        dl = _mods()["dataloader"]
        ref_parts, _ = dl.load_data(
            [str(p) for p in shard_paths], metas_dir, num_workers=1)
        got_parts = load_partitions_data(expand_shard_paths(
            [str(p) for p in shard_paths]))
        assert list(ref_parts.keys()) == list(got_parts.keys()) == [0]
        assert ref_parts[0] == got_parts[0]

    def test_preprocess_matrix_identical(self, tmp_path):
        from acav100m_tpu.pipeline.subset_selection import (
            expand_shard_paths, format_rows, load_partitions_data)

        shard_paths, metas_dir = build_multi_partition_dataset(tmp_path)
        dl = _mods()["dataloader"]
        ref_parts, _ = dl.load_data(
            [str(p) for p in shard_paths], metas_dir, num_workers=1)
        got_parts = load_partitions_data(expand_shard_paths(
            [str(p) for p in shard_paths]))
        for pid in sorted(ref_parts):
            A_ref, shard_names_ref, filenames_ref, types_ref = dl.preprocess(
                ref_parts[pid], num_workers=1)
            A_got, shard_names_got, filenames_got, types_got = format_rows(
                got_parts[pid])
            np.testing.assert_array_equal(A_ref, A_got)
            assert list(types_ref) == list(types_got)
            assert list(shard_names_ref) == list(shard_names_got)
            assert list(filenames_ref) == list(filenames_got)

    def test_reference_format_row_list_array_raises(self):
        """dataloader.py:30-32 does ``for i in range(array)`` when the
        assignment array is a LIST -> TypeError. Executed pin of the quirk;
        the repo's format_rows accepts list arrays (deliberate divergence,
        PARITY.md)."""
        from acav100m_tpu.pipeline.subset_selection import format_rows

        dl = _mods()["dataloader"]
        row = {
            "filename": "a.mp4", "shard_name": "s",
            "video_assignments": [{"model_key": "m", "array": [1, 2]}],
            "audio_assignments": [],
        }
        with pytest.raises(TypeError):
            dl.format_row((0, row))
        A, _, _, types = format_rows([row])
        assert A.tolist() == [[1, 2]]
        assert types == [("m", "layer_0"), ("m", "layer_1")]


class TestChunkParity:
    def test_get_chunks_and_split_chunks(self):
        from acav100m_tpu.pipeline.subset_selection import get_chunks

        utils = _mods()["utils"]
        for n in (1, 2, 3, 7, 10):
            li = [f"s{i}" for i in range(10)]
            assert [list(c) for c in utils.get_chunks(li, n)] == \
                list(get_chunks(li, n))
        # split into m chunks == get_chunks with ceil(len/m)
        for m in (1, 2, 3, 4, 10):
            li = list(range(10))
            ref = [list(c) for c in utils.split_chunks(li, m)]
            n = math.ceil(len(li) / m)
            assert ref == list(get_chunks(li, n))

    def test_chunk_mode_subset_size_rule(self, tmp_path):
        """chunk.py:44-46: per-chunk subset.size = ceil(size/num_chunks).
        Drive the repo's run_chunks on 4 shards with chunk_size=2 and
        subset.size=5 and assert each chunk's cache csv has ceil(5/2)=3
        rows, merged output cut to 5 — the reference rule computed with
        the reference's own get_chunks/split_chunks arithmetic."""
        from acav100m_tpu.pipeline import subset_selection as ss

        utils = _mods()["utils"]
        root = tmp_path / "shards"
        root.mkdir()
        metas_dir = root / "metas"
        metas_dir.mkdir()
        rng = np.random.RandomState(1)
        shard_paths = []
        for s in range(4):
            name = f"shard-{s:06d}"
            rows = [make_row(s * 6 + j, name, rng) for j in range(6)]
            with open(root / f"{name}.pkl", "wb") as f:
                pickle.dump(rows, f)
            with open(metas_dir / f"{name}.json", "w") as f:
                json.dump([{"filename": r["filename"], "id": f"v{s}_{j}",
                            "segment": [0.0, 10.0]}
                           for j, r in enumerate(rows)], f)
            shard_paths.append(root / f"{name}.pkl")
        with open(root / "log_h_1_1.json", "w") as f:
            json.dump({"shards": [p.stem for p in shard_paths]}, f)

        chunk_size, subset_size = 2, 5
        ref_chunks = [list(c) for c in utils.get_chunks(
            [str(p) for p in shard_paths], chunk_size)]
        num_chunks = len(ref_chunks)
        per_chunk = math.ceil(subset_size / num_chunks)

        cfg = ss.get_config({
            "data": {"path": [str(p) for p in shard_paths],
                     "output": {"path": str(tmp_path / "out.csv")},
                     "meta": {"path": str(metas_dir)}},
            "subset": {"size": subset_size},
            "chunk_size": chunk_size,
        })
        out_path, count = ss.run_chunks(cfg)
        cache_csvs = sorted((tmp_path / "caches").glob("cache_*out.csv"))
        assert len(cache_csvs) == num_chunks == 2
        for p in cache_csvs:
            lines = [l for l in p.read_text().splitlines() if l.strip()]
            assert len(lines) == per_chunk == 3
        merged = [l for l in Path(out_path).read_text().splitlines()
                  if l.strip()]
        assert len(merged) == count

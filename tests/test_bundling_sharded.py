import json
import tarfile
from pathlib import Path

import numpy as np
import pytest

from acav100m_tpu.pipeline import bundling
from acav100m_tpu.retrieval.sharded import compare_shards, shard_split
from acav100m_tpu.retrieval.runner import gaussian_pair_views
from acav100m_tpu.utils.io import dump_pickle


class TestBundling:
    def test_parse_clip_filename(self):
        vid, start = bundling.parse_clip_filename("abc_xyz_015.mp4")
        assert vid == "abc_xyz" and start == 15.0

    def test_bundle_and_metadata(self, tmp_path):
        clips = []
        for i in range(5):
            p = tmp_path / f"vid{i}_{i * 10:03d}.mp4"
            p.write_bytes(b"x" * 10)
            clips.append(p)
        shards = bundling.bundle_shards(clips, tmp_path / "shards", shard_size=3)
        assert [s.name for s in shards] == ["shard-000000.tar", "shard-000001.tar"]
        with tarfile.open(shards[0]) as tf:
            assert len(tf.getmembers()) == 3
        meta = json.loads((tmp_path / "shards" / "shard-000000.json").read_text())
        assert meta[0]["segment"][1] - meta[0]["segment"][0] == 10.0
        assert meta[0]["id"] == "vid0"

    def test_check_output(self, tmp_path):
        rows = [{"filename": f"c{i}.mp4"} for i in range(3)]
        dump_pickle(rows, tmp_path / "shard-000000.pkl")
        # json with one extra row (missing from pkl)
        meta = [{"filename": f"c{i}.mp4"} for i in range(4)]
        (tmp_path / "shard-000000.json").write_text(json.dumps(meta))
        report = bundling.check_output(tmp_path)
        entry = report["shards"]["shard-000000"]
        assert entry["complete_ratio"] == 0.75
        assert entry["missing_from_pkl"] == ["c3.mp4"]
        assert report["ok"]  # incomplete is tolerated; extra/dup is not
        # duplicate across shards
        dump_pickle(rows[:1], tmp_path / "shard-000001.pkl")
        report = bundling.check_output(tmp_path)
        assert report["duplicates"] == ["c0.mp4"]
        assert not report["ok"]


class TestShardedRetrieval:
    def test_shard_split_covers(self):
        rng = np.random.RandomState(0)
        shards = shard_split(10, 3, rng)
        joined = np.concatenate(shards)
        assert sorted(joined.tolist()) == list(range(10))

    def test_compare_shards_runs_both_modes(self):
        views = gaussian_pair_views(nclasses=6, per_class=8, num_layers=1,
                                    noise=0.2, seed=10)
        res = compare_shards(views, num_shards=2, ncentroids=6,
                             clustering_method="sklearn", seed=10)
        for mode in ("separate", "shared"):
            assert 0.0 <= res[mode]["precision"] <= 1.0
            assert len(res[mode]["per_shard"]) == 2
        # both modes must beat chance (~0.5 matched fraction)
        assert res["shared"]["precision"] > 0.5

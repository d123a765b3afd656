"""End-to-end: synthetic tar shards -> extract -> cluster -> select ->
output.csv, checking every file contract along the way (the reference's
integration-test strategy, test_sample.py, minus the GPU)."""

import csv
from pathlib import Path

import numpy as np
import pytest

from acav100m_tpu.pipeline import feature_extraction as fe
from acav100m_tpu.pipeline import clustering as cl
from acav100m_tpu.pipeline import subset_selection as ss
from acav100m_tpu.utils.io import load_pickle

from .synthetic import make_shards


NUM_SHARDS = 2
CLIPS = 4


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    spec = make_shards(root / "clips", num_shards=NUM_SHARDS, clips_per_shard=CLIPS)
    return root, spec


@pytest.fixture(scope="module")
def extracted(workdir):
    root, spec = workdir
    cfg = fe.get_config(
        {
            "data.media.path": spec,
            "data.output.path": str(root / "features"),
            "data.batch_size": 4,
        }
    )
    saved = fe.run_extraction(cfg)
    return root, spec, cfg, saved


class TestExtraction:
    def test_saves_all_shards(self, extracted):
        root, spec, cfg, saved = extracted
        names = sorted(p.name for p in saved)
        assert names == [f"shard-{i:06d}.pkl" for i in range(NUM_SHARDS)]

    def test_feature_schema_and_dims(self, extracted):
        root, *_ = extracted
        rows = load_pickle(root / "features" / "shard-000000.pkl")
        assert len(rows) == CLIPS
        row = rows[0]
        assert set(row) == {
            "filename", "shard_name", "shard_size",
            "video_features", "audio_features",
        }
        vdims = [
            row["video_features"][0]["array"][f"layer_{i}"].shape[-1]
            for i in range(5)
        ]
        adims = [
            row["audio_features"][0]["array"][f"layer_{i}"].shape[-1]
            for i in range(5)
        ]
        # the reference's own output check (test_sample.py:61-88)
        assert vdims == [88, 352, 704, 1408, 2304]
        assert adims == [64, 128, 256, 512, 128]
        for i in range(5):
            assert np.abs(row["video_features"][0]["array"][f"layer_{i}"]).mean() > 0
            assert np.abs(row["audio_features"][0]["array"][f"layer_{i}"]).mean() > 0

    def test_cache_removed_after_final_save(self, extracted):
        root, *_ = extracted
        assert not list((root / "features").glob("*_cache.pkl"))

    def test_manifest_written(self, extracted):
        root, *_ = extracted
        logs = list((root / "features").glob("log_*.json"))
        assert len(logs) == 1

    def test_rerun_skips_done_shards(self, extracted):
        root, spec, cfg, _ = extracted
        saved = fe.run_extraction(cfg)
        assert saved == []


@pytest.fixture(scope="module")
def clustered(extracted):
    root, spec, fcfg, _ = extracted
    ccfg = cl.get_config(
        {
            "data.path": str(root / "features" / ("shard-{000000..%06d}" % (NUM_SHARDS - 1))),
            "data.output.path": str(root / "clusters"),
            "data.batch_size": 4,
            "clustering.ncentroids": 4,
            "computation.shuffle_bufsize": 8,
        }
    )
    saved = cl.run_clustering(ccfg)
    return root, ccfg, saved


class TestClustering:
    def test_assignment_files(self, clustered):
        root, ccfg, saved = clustered
        assert sorted(p.name for p in saved) == [
            f"shard-{i:06d}.pkl" for i in range(NUM_SHARDS)
        ]

    def test_assignment_schema(self, clustered):
        root, *_ = clustered
        rows = load_pickle(root / "clusters" / "shard-000000.pkl")
        assert len(rows) == CLIPS
        row = rows[0]
        assert set(row) == {
            "filename", "shard_name", "shard_size",
            "video_assignments", "audio_assignments",
        }
        va = row["video_assignments"][0]
        assert va["model_key"] == "layer_slowfast"
        assert sorted(va["array"]) == [f"layer_{i}" for i in range(5)]
        for v in va["array"].values():
            assert 0 <= v < 4

    def test_centroid_cache_written_and_resumable(self, clustered):
        root, ccfg, _ = clustered
        caches = list((root / "clusters").glob("cache_epoch_*"))
        assert caches
        # resume: cached_epoch set -> training is skipped, same assignments
        ccfg2 = ccfg.copy()
        ccfg2.clustering.cached_epoch = ccfg.clustering.epochs - 1
        state, types, dims = cl.train_clusters(ccfg2)
        assert len(types) == 10
        assert sorted(dims) == sorted([88, 352, 704, 1408, 2304, 64, 128, 256, 512, 128])

    def test_manifest_written(self, clustered):
        root, *_ = clustered
        assert list((root / "clusters").glob("log_*.json"))


class TestSelection:
    def test_output_csv(self, clustered, workdir):
        root, ccfg, _ = clustered
        _, spec = workdir
        scfg = ss.get_config(
            {
                "data.path": str(root / "clusters" / ("shard-{000000..%06d}.pkl" % (NUM_SHARDS - 1))),
                "data.output.path": str(root / "output.csv"),
                "data.meta.path": str(Path(spec).parent),
                "subset.ratio": 0.5,
                "batch.batch_size": 4,
                "batch.selection_size": 2,
            }
        )
        out_path, count = ss.run(scfg)
        total = NUM_SHARDS * CLIPS
        assert count == round(0.5 * total)
        with open(out_path) as f:
            lines = list(csv.reader(f))
        assert len(lines) == count
        for shard_name, filename, vid, segment in lines:
            assert shard_name.startswith("shard-")
            assert filename.endswith(".npz")
            assert vid.startswith("vid")  # meta join worked
            assert segment.startswith("[")

    def test_chunked_matches_contract(self, clustered, workdir):
        root, ccfg, _ = clustered
        _, spec = workdir
        scfg = ss.get_config(
            {
                "data.path": str(root / "clusters" / ("shard-{000000..%06d}.pkl" % (NUM_SHARDS - 1))),
                "data.output.path": str(root / "chunked" / "output.csv"),
                "data.meta.path": str(Path(spec).parent),
                "subset.size": 4,
                "chunk_size": 1,
                "batch.batch_size": 4,
                "batch.selection_size": 2,
            }
        )
        out_path, count = ss.run(scfg)
        # 2 chunks x ceil(4/2)=2 rows
        assert count == 4
        assert (root / "chunked" / "caches").exists()
        assert len(list((root / "chunked" / "caches").glob("cache_*"))) == 2

    def test_chunk_prefetch_overlaps_selection(self, clustered, workdir):
        """The next chunk's pkl loads start before the current chunk's
        selection finishes (reference chunk.py:196-226 async overlap)."""
        root, ccfg, _ = clustered
        _, spec = workdir
        scfg = ss.get_config(
            {
                "data.path": str(root / "clusters" / ("shard-{000000..%06d}.pkl" % (NUM_SHARDS - 1))),
                "data.output.path": str(root / "prefetch" / "output.csv"),
                "data.meta.path": str(Path(spec).parent),
                "subset.size": 4,
                "chunk_size": 1,
                "batch.batch_size": 4,
                "batch.selection_size": 2,
            }
        )
        trace = []
        out_path, count = ss.run_chunks(scfg, _trace=trace)
        assert count == 4
        events = {(e, i): t for e, i, t in trace}
        assert ("load_start", 1) in events and ("select_done", 0) in events
        # prefetch of chunk 1 was submitted before chunk 0's selection ended
        assert events[("load_start", 1)] <= events[("select_done", 0)]
        # ... and chunk 0 selected only after its own load completed
        assert events[("load_done", 0)] <= events[("select_start", 0)]

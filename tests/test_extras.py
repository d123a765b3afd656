"""Pair weights, start indices, contrastive alt-measure, compare_measures."""

import numpy as np
import pytest

from acav100m_tpu.ops import mi
from acav100m_tpu.retrieval.pair_weights import get_weights
from acav100m_tpu.retrieval.start_indices import get_start_indices
from acav100m_tpu.pipeline import contrastive_selection as cs
from .test_mi import random_problem


class TestPairWeights:
    def test_none_passthrough(self):
        assert get_weights([(0, 1)], None) is None

    def test_onehot(self):
        # 4 clusterings = 2 views x 2 layers; onehot_1 weights layer 1 only
        pairing = [(0, 1), (0, 2), (1, 3), (2, 3)]
        w = get_weights(pairing, "onehot_1")
        # layer weights [0,1,0,1] mirrored -> pair weight = product
        np.testing.assert_array_equal(w, [0.0, 0.0, 1.0, 0.0])

    def test_linear_positive_normalized(self):
        pairing = [(0, 1), (2, 3), (0, 3)]
        w = get_weights(pairing, "linear")
        assert (np.asarray(w) > 0).all()

    def test_weighted_scoring_changes_ranking(self):
        rng = np.random.RandomState(0)
        assignments, pairs, _ = random_problem(rng, v=40)
        sel_plain = mi.GreedySelector(assignments, pairs, ncentroids=8)
        w = np.zeros(len(pairs), np.float32)
        w[0] = 1.0
        sel_w = mi.GreedySelector(assignments, pairs, ncentroids=8,
                                  pair_weights=w)
        sel_plain.add_samples([0, 1, 2])
        sel_w.add_samples([0, 1, 2])
        s_plain = sel_plain.scores()
        s_w = sel_w.scores()
        assert not np.allclose(s_plain, s_w)
        # weighted with onehot pair == that pair's raw score
        full = np.asarray(
            mi.score_candidates_full(sel_w.cache, sel_w.pairs_all, 8, "mi",
                                     pair_weights=None)
        )
        assert s_w.shape == full.shape


class TestStartIndices:
    def test_zero(self):
        assert get_start_indices("zero", np.zeros((10, 2), int)) == [0]

    def test_random_one_per_class(self):
        rng = np.random.RandomState(0)
        idx = get_start_indices("random_one_per_class", np.zeros((12, 2), int),
                                nclasses=3, ntargets_per_class=4, rng=rng)
        assert len(idx) == 3
        for j, i in enumerate(idx):
            assert j * 4 <= i < (j + 1) * 4

    def test_random_uniform_cluster(self):
        rng = np.random.RandomState(0)
        assignments = np.stack(
            [np.arange(16) % 4, (np.arange(16) // 4) % 4], axis=1
        )
        idx = get_start_indices("random_uniform_cluster", assignments, rng=rng)
        assert len(idx) == 4
        # one per centroid of the pivot clustering
        assert sorted(assignments[idx, 0]) == [0, 1, 2, 3]

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_start_indices("nope", np.zeros((4, 2), int))


class TestContrastiveSelection:
    def _features(self, rng, v=256, matched=128):
        """First `matched` clips have correlated video/audio features."""
        latent = rng.randn(v, 16)
        video = np.concatenate(
            [latent, rng.randn(v, 16)], axis=1
        ).astype(np.float32)
        audio = np.concatenate(
            [latent, rng.randn(v, 8)], axis=1
        ).astype(np.float32)
        # break the correlation for the unmatched half
        audio[matched:, :16] = rng.randn(v - matched, 16)
        return video, audio

    def test_probe_ranks_aligned_clips_higher(self):
        rng = np.random.RandomState(0)
        video, audio = self._features(rng)
        params = cs.train_probe(video, audio, num_epochs=50, batch_size=64,
                                base_lr=3e-3, seed=0)
        scores = cs.alignment_scores(params, video, audio)
        top = np.argsort(-scores)[:128]
        precision = np.mean(top < 128)
        assert precision > 0.85

    def test_rank_and_cut_dedupes(self):
        metas = [{"filename": "a"}, {"filename": "a"}, {"filename": "b"}]
        out = cs.rank_and_cut(metas, np.array([3.0, 2.0, 1.0]), subset_size=2)
        assert [m["filename"] for m in out] == ["a", "b"]
        assert out[0]["score"] == 3.0

    def test_end_to_end_selection(self, tmp_path):
        rng = np.random.RandomState(1)
        video, audio = self._features(rng, v=32, matched=16)
        rows = []
        for i in range(32):
            rows.append(
                {
                    "filename": f"clip{i:03d}.mp4",
                    "shard_name": "shard-000000",
                    "video_features": [
                        {"model_key": "layer_slowfast",
                         "array": {"layer_4": video[i]}}
                    ],
                    "audio_features": [
                        {"model_key": "layer_vggish",
                         "array": {"layer_4": audio[i]}}
                    ],
                }
            )
        from acav100m_tpu.utils.io import dump_pickle

        shard = tmp_path / "shard-000000.pkl"
        dump_pickle(rows, shard)
        out, count = cs.run_contrastive_selection(
            [shard], tmp_path / "out.csv", subset_ratio=0.25, num_epochs=20,
            batch_size=16,
        )
        assert count == 8
        assert out.read_text().count("\n") == 8


class TestCompareMeasures:
    def test_mi_vs_mem_mi_agree(self, tmp_path):
        from acav100m_tpu.pipeline.subset_selection import compare_measures, get_config
        from acav100m_tpu.utils.io import dump_pickle

        rng = np.random.RandomState(2)
        rows = []
        for i in range(30):
            assign = {f"layer_{j}": int(rng.randint(4)) for j in range(3)}
            rows.append(
                {
                    "filename": f"c{i}.mp4",
                    "shard_name": "shard-000000",
                    "shard_size": 30,
                    "video_assignments": [
                        {"model_key": "m", "array": assign}
                    ],
                    "audio_assignments": [],
                }
            )
        dump_pickle(rows, tmp_path / "shard-000000.pkl")
        cfg = get_config(
            {
                "data.path": str(tmp_path / "shard-000000.pkl"),
                "subset.size": 10,
            }
        )
        report = compare_measures(cfg)
        part = report["partitions"][-1]
        # the two MI implementations must make (nearly) identical choices
        assert part["selection_equal_ratio"] > 0.9
        assert part["max_gain_diff"] < 1e-2


class TestParityPolish:
    def test_model_name_aliases(self):
        from acav100m_tpu.models import get_model

        assert get_model("layer_slow_fast") is get_model("layer_slowfast")
        assert get_model("slow_fast") is get_model("slowfast")

    def test_pca_rank_selection(self):
        from acav100m_tpu.retrieval.runner import gaussian_pair_views, run_experiment

        res = run_experiment(
            views=gaussian_pair_views(nclasses=6, per_class=10, num_layers=1,
                                      noise=0.1, seed=11),
            ncentroids=6, clustering_method="sklearn",
            optimizer="pca_rank", measure="pca_cs", seed=11,
        )
        assert 0.0 <= res["precision"] <= 1.0
        assert len(res["selection"]) == res["subset_size"]

    def test_merge_contrastive(self, tmp_path):
        from acav100m_tpu.pipeline.contrastive_selection import merge_contrastive_csvs

        (tmp_path / "a.csv").write_text("s0,f1,0.9\ns0,f2,0.1\n")
        (tmp_path / "b.csv").write_text("s1,f3,0.5\ns1,f1,0.8\n")
        out, n = merge_contrastive_csvs(
            [tmp_path / "a.csv", tmp_path / "b.csv"],
            tmp_path / "merged.csv", subset_size=2,
        )
        lines = out.read_text().strip().split("\n")
        assert n == 2
        assert lines[0].startswith("s0,f1")  # best score first, deduped
        assert lines[1].startswith("s1,f3")

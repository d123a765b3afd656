"""The ground-truth correctness suite: derangement experiments must recover
matched samples (the reference's de-facto test strategy, SURVEY.md sec. 4)."""

import numpy as np
import pytest

from acav100m_tpu.retrieval import derangement as dr
from acav100m_tpu.retrieval import clustering as rc
from acav100m_tpu.retrieval.measures import get_oracle_measure
from acav100m_tpu.retrieval.optimizers import naive_greedy, celf
from acav100m_tpu.retrieval.runner import (
    gaussian_pair_views,
    grid_search,
    run_experiment,
)


class TestDerangement:
    def test_structure(self):
        views = gaussian_pair_views(nclasses=6, per_class=5, num_layers=1, seed=1)
        der = dr.derange_views(views, 0.5, rng=np.random.RandomState(0))
        assert der["dataset_size"] == 6 * 5
        assert der["nclasses"] == 6
        # 3 matched classes of 5 -> 15 true ids
        assert der["subset_size"] == 15
        assert len(der["true_ids"]) == 15
        for rows in der["features"].values():
            assert len(rows) == 30

    def test_true_ids_really_match(self):
        views = gaussian_pair_views(nclasses=6, per_class=5, num_layers=1,
                                    noise=0.0, seed=2)
        der = dr.derange_views(views, 0.5, rng=np.random.RandomState(0))
        labels = {
            view: np.array([d["label"] for d in rows])
            for view, rows in der["features"].items()
        }
        la, lv = labels["audio-layer_0"], labels["visual-layer_0"]
        true = np.asarray(der["true_ids"])
        matched_labels = set(der["matched_classes"]["audio-layer_0"])
        # matched rows agree across views and belong to matched classes
        assert (la[true] == lv[true]).all()
        assert set(la[true]) == matched_labels
        # deranged rows agree at most by chance
        rest = np.setdiff1d(np.arange(30), true)
        assert (la[rest] == lv[rest]).mean() < 0.67

    def test_precision_recall_f1(self):
        p, r, f = dr.precision_recall_f1([1, 2, 3, 4], [3, 4, 5, 6])
        assert (p, r) == (0.5, 0.5)
        assert f == pytest.approx(0.5)


class TestClusteringFrontends:
    @pytest.mark.parametrize("method", ["sgd", "scipy", "sklearn", "pca"])
    def test_frontends_cluster_blobs(self, method):
        rng = np.random.RandomState(0)
        means = rng.randn(4, 8) * 5
        labels = rng.randint(0, 4, 200)
        feats = (means[labels] + 0.1 * rng.randn(200, 8)).astype(np.float32)
        cl = rc.cluster_views({"v-l0": feats}, 4, method=method, seed=0)["v-l0"]
        assert cl.assignments.shape == (200,)
        if method != "pca":  # pca is a 1-d bucketing, weaker
            # cluster purity; sgd mini-batch k-means (like the reference's)
            # can merge two blobs from its near-zero init -> weaker bound
            purity = 0
            for c in range(4):
                members = labels[cl.assignments == c]
                if len(members):
                    purity += np.bincount(members).max()
            assert purity / 200 > (0.7 if method == "sgd" else 0.9)

    def test_assign_matches_training_assignments(self):
        rng = np.random.RandomState(1)
        feats = rng.randn(50, 4).astype(np.float32)
        cl = rc.sklearn_kmeans(feats, 3, seed=0)
        np.testing.assert_array_equal(cl.assign(feats), cl.assignments)


class TestEndToEndRetrieval:
    def test_efficient_greedy_recovers_matches(self):
        res = run_experiment(
            views=gaussian_pair_views(nclasses=8, per_class=12, num_layers=2,
                                      noise=0.2, seed=3),
            ncentroids=8,
            clustering_method="sklearn",
            optimizer="efficient_greedy",
            measure="mi",
            seed=3,
        )
        # ~0.77 is the oracle-verified ceiling for this geometry (the
        # naive sklearn-MI greedy scores identically); chance is ~0.5
        assert res["precision"] > 0.7
        assert res["recall"] > 0.7

    def test_batch_greedy_recovers_matches(self):
        res = run_experiment(
            views=gaussian_pair_views(nclasses=8, per_class=12, num_layers=2,
                                      noise=0.2, seed=4),
            ncentroids=8,
            clustering_method="sklearn",
            optimizer="efficient_batch",
            measure="mi",
            seed=4,
        )
        assert res["precision"] > 0.7

    def test_sgd_clustering_path(self):
        res = run_experiment(
            views=gaussian_pair_views(nclasses=6, per_class=10, num_layers=1,
                                      noise=0.2, seed=5),
            ncentroids=6,
            clustering_method="sgd",
            optimizer="efficient_greedy",
            measure="mi",
            seed=5,
        )
        # sgd mini-batch k-means clusters less cleanly than Lloyd's on tiny
        # data (near-zero init; same property as the reference's) -> the
        # bound is lower but still clearly above the ~0.5 chance level
        assert res["precision"] > 0.55

    def test_constant_measure_is_chance_level(self):
        """Null-hypothesis baseline: ConstantMeasure precision ~ the matched
        fraction (the reference's sanity check)."""
        views = gaussian_pair_views(nclasses=8, per_class=12, num_layers=1,
                                    noise=0.2, seed=6)
        res = run_experiment(
            views=views, ncentroids=8, clustering_method="sklearn",
            optimizer="efficient_greedy", measure="constant", seed=6,
        )
        # ~half the dataset is matched; constant scores select ~randomly
        assert res["precision"] < 0.6

    def test_naive_greedy_agrees_with_efficient_on_tiny(self):
        """Oracle cross-validation: naive sklearn-MI greedy and the
        efficient device greedy pick similar-quality subsets."""
        views = gaussian_pair_views(nclasses=4, per_class=6, num_layers=1,
                                    noise=0.1, seed=7)
        rng = np.random.RandomState(7)
        der = dr.derange_views(views, 0.5, rng=rng)
        feats = {
            v: np.stack([d["data"] for d in rows])
            for v, rows in der["features"].items()
        }
        cls = rc.cluster_views(feats, 4, method="sklearn", seed=7)
        assignments = rc.assignments_matrix(cls)
        pairs = [(0, 1)]
        oracle = get_oracle_measure("mi", assignments, pairs)
        naive_sel, _ = naive_greedy(oracle, der["dataset_size"],
                                    der["subset_size"], [0])
        from acav100m_tpu.retrieval.optimizers import efficient_greedy

        eff_sel, _ = efficient_greedy(assignments, pairs, 4,
                                      der["subset_size"], [0])
        p_naive, _, _ = dr.precision_recall_f1(naive_sel, der["true_ids"])
        p_eff, _, _ = dr.precision_recall_f1(eff_sel, der["true_ids"])
        assert abs(p_naive - p_eff) < 0.25

    def test_celf_matches_naive_greedy(self):
        """CELF == exact greedy on a SUBMODULAR objective (lazy evaluation
        is only sound under diminishing returns; the pair-agreement measure
        is supermodular, where the two legitimately diverge)."""

        rng = np.random.RandomState(8)
        universe = 40
        sets = [set(rng.choice(universe, size=8, replace=False).tolist())
                for _ in range(20)]

        class Coverage:
            def score(self, indices):
                covered = set()
                for i in indices:
                    covered |= sets[i]
                return len(covered)

        oracle = Coverage()
        naive_sel, _ = naive_greedy(oracle, 20, 6, [0])
        celf_sel, _ = celf(oracle, 20, 6, [0])
        assert oracle.score(celf_sel) == oracle.score(naive_sel)

    def test_grid_search(self, tmp_path):
        views = gaussian_pair_views(nclasses=4, per_class=6, num_layers=1,
                                    noise=0.2, seed=9)
        results = grid_search(
            {
                "measure": ["mi", "nmi"],
                "ncentroids": [4],
                "clustering_method": ["sklearn"],
                "optimizer": ["efficient_greedy"],
                "seed": [9],
            },
            out_dir=tmp_path,
            views=views,
        )
        assert len(results) == 2
        assert len(list(tmp_path.glob("result_*.pkl"))) == 2

    def test_grid_search_process_pool_matches_inline(self, tmp_path):
        """Grid on a spawn process pool (reference grid_search.py:25-76 ran
        a 50-proc CPU pool) returns the same results as inline."""
        views = gaussian_pair_views(nclasses=4, per_class=6, num_layers=1,
                                    noise=0.2, seed=9)
        grid = {
            "measure": ["mi", "nmi"],
            "ncentroids": [4],
            "clustering_method": ["sklearn"],
            "optimizer": ["efficient_greedy"],
            "seed": [9],
        }
        inline = grid_search(grid, views=views, num_workers=1)
        pooled = grid_search(grid, out_dir=tmp_path, views=views, num_workers=2)
        assert len(pooled) == 2
        assert len(list(tmp_path.glob("result_*.pkl"))) == 2
        for a, b in zip(inline, pooled):
            assert a["config"] == b["config"]
            assert a["selection"] == b["selection"]
            assert a["f1"] == b["f1"]


class TestImagePairViews:
    def test_digits_rotated_pair_recovery(self):
        """Real-data path: sklearn's bundled digits dataset, original vs
        rotated views (the reference's rotated-MNIST experiment shape)."""
        from sklearn.datasets import load_digits
        from acav100m_tpu.retrieval.runner import image_pair_views

        digits = load_digits()
        images = digits.images[:600]
        labels = digits.target[:600]
        views = image_pair_views(images, labels, transform="rotate")
        res = run_experiment(
            views=views, ncentroids=10, clustering_method="sklearn",
            optimizer="efficient_greedy", measure="mi", seed=0,
        )
        # matched half must be clearly enriched over the ~0.5 chance level
        assert res["precision"] > 0.65

    def test_flip_transform(self):
        from acav100m_tpu.retrieval.runner import image_pair_views

        rng = np.random.RandomState(0)
        images = rng.rand(20, 4, 4)
        views = image_pair_views(images, rng.randint(0, 2, 20), "flip")
        assert set(views) == {"orig-layer_0", "flip-layer_0"}
        assert len(views["orig-layer_0"]) == 20


class TestSampleLevelDerangement:
    def test_structure_and_alignment(self):
        views = gaussian_pair_views(nclasses=4, per_class=10, num_layers=1,
                                    noise=0.0, seed=12)
        der = dr.derange_views_sample_level(
            views, 0.5, rng=np.random.RandomState(0)
        )
        assert der["dataset_size"] == 40
        assert der["subset_size"] == 20
        # matched rows carry identical latent data across views (noise=0
        # gaussian views share class means only, so compare labels AND the
        # originating vid via data equality of the shared latent is not
        # available — check labels align at true ids)
        la = np.array([d["label"] for d in der["features"]["audio-layer_0"]])
        lv = np.array([d["label"] for d in der["features"]["visual-layer_0"]])
        true = np.asarray(der["true_ids"])
        assert (la[true] == lv[true]).all()

    def test_selection_recovers_sample_level_matches(self):
        views = gaussian_pair_views(nclasses=8, per_class=12, num_layers=1,
                                    noise=0.2, seed=13)
        der = dr.derange_views_sample_level(
            views, 0.5, rng=np.random.RandomState(1)
        )
        feats = {
            v: np.stack([d["data"] for d in rows])
            for v, rows in der["features"].items()
        }
        cls = rc.cluster_views(feats, 8, method="sklearn", seed=13)
        assignments = rc.assignments_matrix(cls)
        from acav100m_tpu.retrieval.optimizers import efficient_greedy

        sel, _ = efficient_greedy(assignments, [(0, 1)], 8,
                                  der["subset_size"], [int(der["true_ids"][0])])
        p, _, _ = dr.precision_recall_f1(sel, der["true_ids"])
        assert p > 0.6  # clearly above the 0.5 chance level

    def test_split_views(self):
        views = gaussian_pair_views(nclasses=4, per_class=10, num_layers=1,
                                    seed=14)
        train, test = dr.split_views(views, 0.8, np.random.RandomState(0))
        assert len(train["audio-layer_0"]) == 32
        assert len(test["audio-layer_0"]) == 8
        assert not set(train["audio-layer_0"]) & set(test["audio-layer_0"])


class TestGridFile:
    """Option-grid json loading (reference search_targets format +
    native dict format) and the CLI grid mode."""

    def test_load_reference_format(self, tmp_path):
        import json

        from acav100m_tpu.retrieval.runner import load_option_grid

        grid = [
            [{"measure_type": "mi"}, {"measure_type": "nmi"}],
            [{"cluster_pairing": "combination",
              "clustering_func_type": "sgd_kmeans"}],
            [{"nexprs": 2, "num_shards": None}],  # num_shards -> dropped
        ]
        p = tmp_path / "grid.json"
        p.write_text(json.dumps(grid))
        with pytest.warns(UserWarning, match="dropped"):
            jobs = load_option_grid(p)
        # nexprs expands each config into seed replicates (reference
        # grid_search.py repeats every configuration nexprs times)
        assert jobs == [
            {"measure": "mi", "pairing": "combination",
             "clustering_method": "sgd", "seed": 0},
            {"measure": "mi", "pairing": "combination",
             "clustering_method": "sgd", "seed": 1},
            {"measure": "nmi", "pairing": "combination",
             "clustering_method": "sgd", "seed": 0},
            {"measure": "nmi", "pairing": "combination",
             "clustering_method": "sgd", "seed": 1},
        ]

    def test_contrastive_optimizer_recovers_matched_pairs(self):
        """The MetricLearning/contrastive measure (reference
        measures/metric.py + measures/contrastive/): train the InfoNCE
        probe on deranged pair features, rank by aligned inner product —
        matched pairs carry the shared per-sample latent the deranged ones
        lack."""
        from acav100m_tpu.retrieval.runner import (
            gaussian_pair_views,
            run_experiment,
        )

        views = gaussian_pair_views(nclasses=6, per_class=20, num_layers=1,
                                    noise=0.2, seed=5)
        res = run_experiment(views=views, ncentroids=6,
                             clustering_method="sklearn",
                             optimizer="contrastive", seed=0)
        base = run_experiment(views=views, ncentroids=6,
                              clustering_method="sklearn",
                              measure="constant",
                              optimizer="efficient_greedy", seed=0)
        assert res["f1"] >= 0.9
        assert res["f1"] > base["f1"] + 0.2

    def test_load_reference_measure_and_batch_translation(self, tmp_path):
        """The reference's measure names bundle the optimizer, its
        selection_size is the per-batch top-k, and data_name is kept for
        the worker's views factory (ours.json shape)."""
        import json

        from acav100m_tpu.retrieval.runner import load_option_grid

        grid = [
            [{"data_name": "image_pair_mnist_sound"}],
            [{"measure": "efficient_batch_mi"}],
            [{"batch_size": 100, "selection_size": 25}],
        ]
        p = tmp_path / "grid.json"
        p.write_text(json.dumps(grid))
        jobs = load_option_grid(p)
        assert jobs == [{
            "data_name": "image_pair_mnist_sound",
            "optimizer": "efficient_batch",
            "measure": "mi",
            "batch_size": 100,
            "batch_selection_size": 25,
            "seed": 0,
        }]

    def test_load_dict_format(self, tmp_path):
        import json

        from acav100m_tpu.retrieval.runner import load_option_grid

        p = tmp_path / "grid.json"
        p.write_text(json.dumps({"measure": ["mi", "ami"], "seed": [3]}))
        jobs = load_option_grid(p)
        assert jobs == [{"measure": "mi", "seed": 3},
                        {"measure": "ami", "seed": 3}]

    def test_cli_grid_mode(self, tmp_path, capsys):
        import json

        from acav100m_tpu.cli import main

        p = tmp_path / "grid.json"
        p.write_text(json.dumps({"measure": ["mi", "nmi"],
                                 "ncentroids": [4], "seed": [5],
                                 "clustering_method": ["sklearn"]}))
        main(["retrieval", "--grid", str(p),
              "--out_path", str(tmp_path / "results")])
        out = capsys.readouterr().out
        assert out.count("precision=") == 2
        assert len(list((tmp_path / "results").glob("result_*.pkl"))) == 2

"""Real-data retrieval parity stack (VERDICT round-1 task 7): flax
ResNet-50 layer taps + chunked feature cache, image pair views through the
backbone, MNIST-sound-style audio pairs, and the derangement experiment on
both — with P/R/F1 beating the ConstantMeasure null baseline.

Reference: correspondence_retrieval/code/model.py:137-222 (ResNet taps),
feature.py:13-98 (chunked pkl cache), image_pair_data.py:26-204 (pairs).
"""

import numpy as np
import pytest

from acav100m_tpu.retrieval import features as rf
from acav100m_tpu.retrieval.runner import run_experiment


class TestResNetTaps:
    def test_tap_dims(self):
        import jax

        ext = rf.ImageFeatureExtractor(size=32, chunk_size=8)
        images = np.random.RandomState(0).randint(0, 255, (8, 32, 32, 3))
        feats = ext.extract(images)
        assert sorted(feats) == ["layer_0", "layer_1", "layer_2", "layer_3"]
        for l, dim in enumerate(rf.LAYER_DIMS):
            assert feats[f"layer_{l}"].shape == (8, dim)
            assert np.isfinite(feats[f"layer_{l}"]).all()

    def test_grayscale_input_promoted(self):
        ext = rf.ImageFeatureExtractor(size=32, chunk_size=8)
        images = np.random.RandomState(1).randint(0, 255, (4, 32, 32))
        feats = ext.extract(images)
        assert feats["layer_3"].shape == (4, 2048)

    def test_torchvision_conversion_tree_matches(self):
        """Synthetic torchvision-style state dict converts into the exact
        flax tree (keys + shapes), so real ImageNet weights drop in."""
        import jax

        ext = rf.ImageFeatureExtractor(size=32)
        rng = np.random.RandomState(2)
        sd = {}

        def add_bn(tk, c):
            sd[f"{tk}.weight"] = rng.randn(c).astype(np.float32)
            sd[f"{tk}.bias"] = rng.randn(c).astype(np.float32)
            sd[f"{tk}.running_mean"] = rng.randn(c).astype(np.float32)
            sd[f"{tk}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 1

        sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
        add_bn("bn1", 64)
        for li, nblocks in enumerate(rf.RESNET50_BLOCKS):
            dim_out = 256 * (2 ** li)
            inner = dim_out // 4
            cin = 64 if li == 0 else dim_out // 2
            for bi in range(nblocks):
                tmod = f"layer{li + 1}.{bi}"
                c1 = cin if bi == 0 else dim_out
                sd[f"{tmod}.conv1.weight"] = rng.randn(inner, c1, 1, 1).astype(np.float32)
                add_bn(f"{tmod}.bn1", inner)
                sd[f"{tmod}.conv2.weight"] = rng.randn(inner, inner, 3, 3).astype(np.float32)
                add_bn(f"{tmod}.bn2", inner)
                sd[f"{tmod}.conv3.weight"] = rng.randn(dim_out, inner, 1, 1).astype(np.float32)
                add_bn(f"{tmod}.bn3", dim_out)
                if bi == 0:
                    sd[f"{tmod}.downsample.0.weight"] = rng.randn(
                        dim_out, c1, 1, 1).astype(np.float32)
                    add_bn(f"{tmod}.downsample.1", dim_out)
        converted = rf.convert_torchvision_resnet50(sd)
        from acav100m_tpu.models.zoo import flatten_tree

        want = {k: np.asarray(v).shape for k, v in flatten_tree(
            jax.tree_util.tree_map(np.asarray, ext.variables)).items()}
        got = {k: np.asarray(v).shape for k, v in flatten_tree(converted).items()}
        assert want == got


class TestChunkedCache:
    def test_cache_files_written_and_reused(self, tmp_path):
        rng = np.random.RandomState(3)
        images = rng.randint(0, 255, (20, 32, 32, 3))
        ext = rf.ImageFeatureExtractor(size=32, chunk_size=8,
                                       cache_dir=tmp_path)
        first = ext.extract(images)
        files = sorted(tmp_path.glob("feature_chunk_*.pkl"))
        assert len(files) == 3  # ceil(20/8)
        # corrupt-proof reuse: second extract must read the cache, so
        # mutating the images must NOT change the output
        second = ext.extract(rng.randint(0, 255, (20, 32, 32, 3)))
        np.testing.assert_array_equal(first["layer_3"], second["layer_3"])

    def test_partial_cache_resume(self, tmp_path):
        rng = np.random.RandomState(4)
        images = rng.randint(0, 255, (16, 32, 32, 3))
        ext = rf.ImageFeatureExtractor(size=32, chunk_size=8,
                                       cache_dir=tmp_path)
        full = ext.extract(images)
        # delete one chunk; re-extract recomputes only that chunk
        files = sorted(tmp_path.glob("feature_chunk_*.pkl"))
        files[1].unlink()
        again = ext.extract(images)
        np.testing.assert_allclose(full["layer_2"], again["layer_2"],
                                   rtol=1e-5, atol=1e-5)


class TestAudioPairs:
    def test_spoken_digit_features_are_class_separable(self):
        labels = np.repeat(np.arange(4), 8)
        audio = rf.synthesize_spoken_digits(labels, seed=5)
        assert audio.shape == (32, 4000)
        feats = rf.audio_logmel_features(audio)
        assert feats.shape == (32, 32)
        # within-class spread < between-class spread on at least one band
        centroids = np.stack([feats[labels == c].mean(0) for c in range(4)])
        between = np.var(centroids, axis=0).max()
        within = np.mean(
            [feats[labels == c].var(axis=0).max() for c in range(4)]
        )
        assert between > within


class TestRealDataExperiments:
    """Derangement P/R/F1 on ResNet-featurized image pairs and
    image+audio pairs vs the ConstantMeasure baseline (PARITY.md table)."""

    @pytest.fixture(scope="class")
    def digits(self):
        return rf.synthetic_digits(nclasses=6, per_class=12, size=32, seed=6)

    def test_image_pairs_beat_constant_baseline(self, digits):
        images, labels = digits
        views = rf.resnet_pair_views(images, labels, transform="rotate",
                                     layers=(2, 3))
        res = run_experiment(views=views, ncentroids=6,
                             clustering_method="sklearn",
                             measure="mi", optimizer="efficient_greedy",
                             seed=0)
        base = run_experiment(views=views, ncentroids=6,
                              clustering_method="sklearn",
                              measure="constant",
                              optimizer="efficient_greedy", seed=0)
        assert res["f1"] > base["f1"]
        assert res["f1"] > 0.55
        print("image-pair resnet:", res["precision"], res["recall"], res["f1"],
              "constant:", base["f1"])

    def test_mnist_sound_pairs_beat_constant_baseline(self, digits):
        """Round-2 VERDICT weak #4: the margin must be decisive, not 0.53
        vs 0.50. With the reference's extract_each_layer protocol (all 4
        ResNet taps -> 4 bipartite pairs) the audio-pair pipeline clears
        the null by >=0.15 F1."""
        images, labels = digits
        views = rf.mnist_sound_pair_views(images, labels, seed=7)
        assert set(views) == {
            "visual-layer_0", "visual-layer_1", "visual-layer_2",
            "visual-layer_3", "audio-layer_0",
        }
        res = run_experiment(views=views, ncentroids=6,
                             clustering_method="sklearn", measure="mi",
                             optimizer="efficient_greedy", pairing="bipartite",
                             seed=1)
        base = run_experiment(views=views, ncentroids=6,
                              clustering_method="sklearn", measure="constant",
                              optimizer="efficient_greedy",
                              pairing="bipartite", seed=1)
        assert res["f1"] >= 0.65
        assert res["f1"] - base["f1"] >= 0.15
        print("mnist-sound:", res["precision"], res["recall"], res["f1"],
              "constant:", base["f1"])

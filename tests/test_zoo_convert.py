"""Checkpoint-acquisition plumbing: zoo parsing, convert verb, caffe2 names.

Covers VERDICT round-1 task 6 (reference
``feature_extraction/code/models/utils_slowfast/load_model.py:63-128``):
MODEL_ZOO.md table parsing, torch/caffe2 -> flax npz conversion with
checksums, and the npz load path in ``build_models``.
"""

import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acav100m_tpu.models import zoo
from .synthetic import make_pyslowfast_state_dict

FAKE_ZOO = """
# Kinetics

| architecture | depth | frame length x sample rate | top1 | model | config |
| ------------ | ----- | -------------------------- | ---- | ----- | ------ |
| SlowFast | R50 | 8 x 8 | 77.0 | [link](https://dl.fbaipublicfiles.com/x/SLOWFAST_8x8_R50.pkl) | Kinetics/c2/SLOWFAST_8x8_R50 |
| Slow | R50 | 4 x 16 | 72.6 | [link](https://dl.fbaipublicfiles.com/x/SLOW_4x16_R50.pkl) | Kinetics/c2/SLOW_4x16_R50 |

some prose in between

| architecture | depth | AVA version | mAP | model |
| ------------ | ----- | ----------- | --- | ----- |
| SlowFast | R101 | v2.2 | 29.1 | [link](https://dl.fbaipublicfiles.com/x/SLOWFAST_64x2_R101.pkl) |

| unrelated | table |
| --------- | ----- |
| a | b |
"""


class TestZooParse:
    def test_parse_config_column(self):
        choices = zoo.parse_model_zoo(FAKE_ZOO)
        assert choices["Kinetics/c2/SLOWFAST_8x8_R50"] == (
            "https://dl.fbaipublicfiles.com/x/SLOWFAST_8x8_R50.pkl"
        )
        assert choices["Kinetics/c2/SLOW_4x16_R50"] == (
            "https://dl.fbaipublicfiles.com/x/SLOW_4x16_R50.pkl"
        )

    def test_parse_ava_table_derives_config_from_filename(self):
        choices = zoo.parse_model_zoo(FAKE_ZOO)
        assert choices["AVA/c2/SLOWFAST_64x2_R101"] == (
            "https://dl.fbaipublicfiles.com/x/SLOWFAST_64x2_R101.pkl"
        )

    def test_unrelated_tables_ignored(self):
        choices = zoo.parse_model_zoo(FAKE_ZOO)
        assert len(choices) == 3

    def test_get_model_zoo_uses_choices_cache(self, tmp_path):
        (tmp_path / "choices.json").write_text(json.dumps({"x": "https://y"}))
        assert zoo.get_model_zoo(tmp_path) == {"x": "https://y"}


class TestDownloadGate:
    def test_fetch_raises_with_instructions(self, tmp_path):
        with pytest.raises(zoo.DownloadGatedError, match="curl -L -o"):
            zoo.fetch_url("https://127.0.0.1:1/nothing", tmp_path / "f", timeout=2)

    def test_fetch_skips_existing(self, tmp_path):
        p = tmp_path / "f"
        p.write_bytes(b"cached")
        assert zoo.fetch_url("https://127.0.0.1:1/nothing", p) == p


class TestNpzRoundTrip:
    def test_flatten_unflatten_save_load(self, tmp_path):
        tree = {
            "params": {"a": {"kernel": np.arange(6.0).reshape(2, 3)}},
            "batch_stats": {"a": {"mean": np.zeros(3)}},
        }
        path = zoo.save_flax_npz(tree, tmp_path / "w.npz")
        got = zoo.load_flax_npz(path)
        np.testing.assert_array_equal(
            got["params"]["a"]["kernel"], tree["params"]["a"]["kernel"]
        )
        np.testing.assert_array_equal(
            got["batch_stats"]["a"]["mean"], tree["batch_stats"]["a"]["mean"]
        )


class TestCaffe2Names:
    def test_round_trip_over_full_topology(self):
        """Every PySlowFast name maps to a caffe2 blob and back."""
        sd = make_pyslowfast_state_dict(np.random.RandomState(0))
        blobs = {}
        for name, v in sd.items():
            c2 = zoo.pyslowfast_to_caffe2_name(name)
            assert c2 is not None, name
            blobs[c2] = v
        assert len(blobs) == len(sd)  # no collisions
        back = zoo.caffe2_to_pyslowfast(blobs)
        assert set(back) == set(sd)
        for name in sd:
            np.testing.assert_array_equal(back[name], sd[name])

    def test_momentum_and_head_blobs_skipped(self):
        blobs = {
            "conv1_w": np.zeros((64, 3, 1, 7, 7), np.float32),
            "conv1_w_momentum": np.zeros(1),
            "pred_w": np.zeros((400, 2304)),
        }
        out = zoo.caffe2_to_pyslowfast(blobs)
        assert list(out) == ["s1.pathway0_stem.conv.weight"]

    def test_unknown_blob_raises(self):
        with pytest.raises(ValueError, match="unmapped caffe2 blobs"):
            zoo.caffe2_to_pyslowfast({"mystery_blob_w": np.zeros(1)})


class TestConvertVerb:
    @pytest.fixture(scope="class")
    def sd(self):
        return make_pyslowfast_state_dict(np.random.RandomState(1))

    def test_convert_caffe2_pkl_matches_direct_conversion(self, tmp_path, sd):
        from acav100m_tpu.models.slowfast import (
            LayerSlowFast,
            convert_pyslowfast_state_dict,
        )

        blobs = {zoo.pyslowfast_to_caffe2_name(k): v for k, v in sd.items()}
        in_path = tmp_path / "ckpt.pkl"
        with open(in_path, "wb") as f:
            pickle.dump({"blobs": blobs}, f)
        out_path = tmp_path / "slowfast.npz"
        manifest = zoo.convert_checkpoint("slowfast", in_path, out_path)
        assert manifest["format"] == "caffe2"
        assert len(manifest["input_sha256"]) == 64
        assert json.loads((tmp_path / "slowfast.npz.json").read_text()) == manifest

        got = zoo.load_flax_npz(out_path)
        want = convert_pyslowfast_state_dict(sd)
        for key, leaf in zoo.flatten_tree(want).items():
            np.testing.assert_array_equal(zoo.flatten_tree(got)[key], leaf)

        # converted weights drive the real model
        out = LayerSlowFast().apply(
            got, jnp.asarray(np.random.RandomState(2).randint(
                0, 255, (1, 32, 32, 32, 3)), jnp.uint8),
        )
        assert [int(t.shape[-1]) for t in out] == [88, 352, 704, 1408, 2304]
        assert all(np.isfinite(np.asarray(t)).all() for t in out)

    def test_convert_pyslowfast_torch_file(self, tmp_path, sd):
        import torch

        in_path = tmp_path / "ckpt.pyth"
        torch.save({"model_state": {k: torch.from_numpy(v) for k, v in sd.items()}},
                   in_path)
        manifest = zoo.convert_checkpoint("slowfast", in_path,
                                          tmp_path / "w.npz")
        assert manifest["format"] == "pyslowfast"
        assert (tmp_path / "w.npz").is_file()

    def test_convert_vggish(self, tmp_path):
        import torch

        from acav100m_tpu.models.vggish import _TORCH_CONV_KEYS, _TORCH_FC_KEYS

        rng = np.random.RandomState(3)
        sd = {}
        shapes = {
            "features.0": (64, 1), "features.3": (128, 64),
            "features.6": (256, 128), "features.8": (256, 256),
            "features.11": (512, 256), "features.13": (512, 512),
        }
        for tk, _ in _TORCH_CONV_KEYS:
            o, i = shapes[tk]
            sd[f"{tk}.weight"] = torch.from_numpy(
                0.05 * rng.randn(o, i, 3, 3).astype(np.float32))
            sd[f"{tk}.bias"] = torch.zeros(o)
        fc_shapes = {"embeddings.0": (4096, 512 * 4 * 6),
                     "embeddings.2": (4096, 4096), "embeddings.4": (128, 4096)}
        for tk, _ in _TORCH_FC_KEYS:
            o, i = fc_shapes[tk]
            sd[f"{tk}.weight"] = torch.from_numpy(
                0.01 * rng.randn(o, i).astype(np.float32))
            sd[f"{tk}.bias"] = torch.zeros(o)
        in_path = tmp_path / "vggish.pth"
        torch.save(sd, in_path)
        manifest = zoo.convert_checkpoint("vggish", in_path, tmp_path / "v.npz")
        assert manifest["model"] == "vggish"
        tree = zoo.load_flax_npz(tmp_path / "v.npz")
        assert tree["params"]["block0_conv0"]["kernel"].shape == (3, 3, 1, 64)


class TestBuildModelsNpzPath:
    def test_build_models_loads_converted_npz(self, tmp_path):
        from acav100m_tpu.models.slowfast import convert_pyslowfast_state_dict
        from acav100m_tpu.pipeline.feature_extraction import (
            build_models,
            get_config,
        )

        sd = make_pyslowfast_state_dict(np.random.RandomState(4))
        tree = convert_pyslowfast_state_dict(sd)
        path = zoo.save_flax_npz(tree, tmp_path / "sf.npz")
        cfg = get_config({
            "models": ["layer_slowfast"],
            "weights.slowfast_file": str(path),
        })
        models, params = build_models(cfg, key=jax.random.PRNGKey(0))
        got = np.asarray(params["layer_slowfast"]["params"]["s1_slow"]["conv"]["kernel"])
        want = sd["s1.pathway0_stem.conv.weight"].transpose(2, 3, 4, 1, 0)
        np.testing.assert_array_equal(got, want)

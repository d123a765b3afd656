import json
from pathlib import Path

import pytest

from acav100m_tpu.config import Config, build_config, parse_overrides
from acav100m_tpu.utils import (
    braceexpand,
    node_selection,
    worker_selection,
    plan_shards,
    get_length,
    write_run_manifest,
    read_run_manifests,
)
from acav100m_tpu.utils.io import (
    make_feature_row,
    save_shard_output,
    save_shard_cache,
    load_shard_caches,
    save_output_csv,
    merge_csvs,
    load_pickle,
)


class TestConfig:
    def test_defaults_and_attr_access(self):
        cfg = build_config({"a": {"b": 1}, "c": "x"})
        assert cfg.a.b == 1
        assert cfg.c == "x"

    def test_missing_keys_read_none(self):
        # DefaultMunch(None) semantics (reference args.py:85-96)
        cfg = build_config({"a": {"b": 1}})
        assert cfg.zzz is None
        assert cfg.a.zzz is None

    def test_dotted_overrides(self):
        cfg = build_config({"a": {"b": 1, "c": 2}}, {"a.b": "7"})
        assert cfg.a.b == 7
        assert cfg.a.c == 2

    def test_strict_rejects_unknown(self):
        with pytest.raises(KeyError):
            build_config({"a": {"b": 1}}, {"a.zzz": 1}, strict=True)

    def test_nonstrict_creates_unknown(self):
        cfg = build_config({"a": {"b": 1}}, {"x.y": "3"}, strict=False)
        assert cfg.x.y == 3

    def test_path_suffix_resolution(self):
        cfg = build_config({"data": {"out_path": "/tmp/x", "name": "y"}})
        assert isinstance(cfg.data.out_path, Path)
        assert cfg.data.name == "y"

    def test_value_coercion(self):
        cfg = build_config(
            {"a": 1, "b": True, "c": None, "d": [1], "e": "s"},
            {"a": "2.5", "b": "false", "c": "none", "d": "[1,2]", "e": "text"},
        )
        assert cfg.a == 2.5
        assert cfg.b is False
        assert cfg.c is None
        assert cfg.d == [1, 2]
        assert cfg.e == "text"

    def test_parse_overrides(self):
        assert parse_overrides(["--a.b=1", "c=x"]) == {"a.b": "1", "c": "x"}

    def test_roundtrip(self):
        cfg = Config({"a": {"b": [1, 2]}})
        assert cfg.to_dict() == {"a": {"b": [1, 2]}}


class TestBraceexpand:
    def test_numeric_padded(self):
        got = list(braceexpand("shard-{000000..000003}.tar"))
        assert got == [f"shard-{i:06d}.tar" for i in range(4)]

    def test_comma_list(self):
        assert list(braceexpand("a{x,y}b")) == ["axb", "ayb"]

    def test_char_range(self):
        assert list(braceexpand("{a..c}")) == ["a", "b", "c"]

    def test_no_expansion(self):
        assert list(braceexpand("plain.tar")) == ["plain.tar"]

    def test_nested(self):
        assert list(braceexpand("{a,b{1..2}}")) == ["a", "b1", "b2"]

    def test_multiple_groups(self):
        assert list(braceexpand("{0..1}-{x,y}")) == ["0-x", "0-y", "1-x", "1-y"]


class TestShardPlanning:
    def test_node_selection_disjoint(self):
        urls = [f"s{i}" for i in range(10)]
        parts = [node_selection(urls, index=r, total=3) for r in range(3)]
        assert sorted(sum(parts, [])) == sorted(urls)
        assert parts[0] == ["s0", "s3", "s6", "s9"]

    def test_node_selection_train_wraparound(self):
        # every rank sees ALL shards, in a rank-rotated order
        urls = [f"s{i}" for i in range(6)]
        for r in range(3):
            mine = node_selection(urls, index=r, total=3, is_train=True)
            assert sorted(mine) == sorted(urls)
        assert node_selection(urls, 1, 3, is_train=True)[0] == "s1"

    def test_worker_selection(self):
        urls = [f"s{i}" for i in range(5)]
        assert worker_selection(urls, 1, 2) == ["s1", "s3"]

    def test_plan_shards(self, tmp_path):
        mine, all_ = plan_shards(
            tmp_path / "shard-{000000..000007}", index=1, total=4, suffix=".tar"
        )
        assert len(all_) == 8
        assert [Path(p).name for p in mine] == [
            "shard-000001.tar",
            "shard-000005.tar",
        ]

    def test_plan_shards_discard_remainder(self, tmp_path):
        with pytest.warns(UserWarning):
            mine, all_ = plan_shards(
                tmp_path / "shard-{000000..000006}",
                index=0,
                total=3,
                discard_remainder=True,
            )
        assert len(all_) == 6

    def test_get_length_equalizes(self):
        sizes = [10, 20, 5, 7]
        length = get_length(sizes, batch_size=4, num_workers=2, total=2)
        # rank 0 gets [10, 5] -> workers [10],[5] -> max ceil = 3 iters
        # rank 1 gets [20, 7] -> workers [20],[7] -> max ceil = 5 iters
        assert length == 5 * 4


class TestManifests:
    def test_roundtrip_partitions(self, tmp_path):
        p1 = write_run_manifest(
            tmp_path,
            [tmp_path / "shard-000000.pkl", tmp_path / "shard-000001.pkl"],
            run_info={"hostname": "h", "pid": 1, "timestamp": 100},
        )
        p2 = write_run_manifest(
            tmp_path,
            [tmp_path / "shard-000001.pkl", tmp_path / "shard-000002.pkl"],
            run_info={"hostname": "h", "pid": 1, "timestamp": 200},
        )
        assert p1.name == "log_h_1_100.json"
        parts = read_run_manifests(tmp_path)
        # newer log wins for shard-000001
        assert parts["shard-000000"] == 0
        assert parts["shard-000001"] == 1
        assert parts["shard-000002"] == 1

    def test_schema_matches_reference(self, tmp_path):
        path = write_run_manifest(tmp_path, ["a.pkl"])
        log = json.loads(path.read_text())
        assert set(log) >= {"hostname", "pid", "timestamp", "time", "shards"}
        assert log["shards"] == ["a"]


class TestIOSchemas:
    def _row(self, fname="clip_000.mp4"):
        return make_feature_row(
            filename=fname,
            shard_name="shard-000000",
            shard_size=4,
            per_model=[
                {
                    "model_key": "layer_slowfast",
                    "extractor_name": "SLOWFAST_8x8_R50",
                    "dataset": "kinetics-400",
                    "array": [1, 2, 3, 4, 5],
                },
                {
                    "model_key": "layer_vggish",
                    "extractor_name": "VGGish",
                    "dataset": "YouTube-8M",
                    "array": [6, 7],
                },
            ],
            audio_model_keys=["layer_vggish", "vggish"],
        )

    def test_feature_row_schema(self):
        row = self._row()
        assert set(row) == {
            "filename",
            "shard_name",
            "shard_size",
            "video_features",
            "audio_features",
        }
        assert row["video_features"][0]["array"] == {
            f"layer_{i}": v for i, v in enumerate([1, 2, 3, 4, 5])
        }
        assert row["audio_features"][0]["model_key"] == "layer_vggish"

    def test_cache_and_skip_lists(self, tmp_path):
        rows = [self._row("a.mp4"), self._row("b.mp4")]
        save_shard_cache(rows, tmp_path, "shard-000000")
        caches, skips = load_shard_caches(
            tmp_path, [tmp_path / "shard-000000.tar", tmp_path / "shard-000001.tar"]
        )
        assert skips["shard-000000"] == ["a.mp4", "b.mp4"]
        assert skips["shard-000001"] == []
        # final save removes the cache
        save_shard_output(rows, tmp_path, "shard-000000", final=True)
        assert not (tmp_path / "shard-000000_cache.pkl").exists()
        assert load_pickle(tmp_path / "shard-000000.pkl") == rows

    def test_output_csv(self, tmp_path):
        data = [
            {"filename": "a.mp4", "shard_name": "shard-000000"},
            {"filename": "zz.mp4", "shard_name": "shard-000000"},
        ]
        metas = {"shard-000000": {"a": {"id": "vid1", "segment": [0.0, 10.0]}}}
        out, count = save_output_csv(data, metas, tmp_path / "output.csv")
        assert count == 2
        lines = out.read_text().strip().split("\n")
        assert lines[0] == 'shard-000000,a.mp4,vid1,"[0.0, 10.0]"'
        assert lines[1] == 'shard-000000,zz.mp4,-1,"[-1.0, -1.0]"'

    def test_merge_csvs(self, tmp_path):
        (tmp_path / "a.csv").write_text("1\n2\n")
        (tmp_path / "b.csv").write_text("3\n")
        n = merge_csvs([tmp_path / "b.csv", tmp_path / "a.csv"], tmp_path / "out.csv")
        assert n == 3
        assert (tmp_path / "out.csv").read_text() == "1\n2\n3\n"

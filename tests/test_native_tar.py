"""Native tar indexer vs Python tarfile."""

import io
import tarfile

import numpy as np
import pytest

from acav100m_tpu.data import native_tar


@pytest.fixture(scope="module")
def sample_tar(tmp_path_factory):
    root = tmp_path_factory.mktemp("tario")
    path = root / "sample.tar"
    rng = np.random.RandomState(0)
    contents = {}
    with tarfile.open(path, "w") as tf:
        for i in range(5):
            name = f"dir{i}/clip_{i:03d}.npz" if i % 2 else f"clip_{i:03d}.npz"
            data = rng.bytes(rng.randint(1, 2000))
            contents[name] = data
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        # a long GNU name
        longname = "x" * 150 + ".bin"
        data = b"longdata"
        contents[longname] = data
        info = tarfile.TarInfo(longname)
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    return path, contents


class TestNativeTar:
    def test_builds(self):
        assert native_tar.available(), "g++ is in this image; build must work"

    def test_index_matches_tarfile(self, sample_tar):
        path, contents = sample_tar
        index = native_tar.index_tar(path)
        assert index is not None
        assert {n for n, _, _ in index} == set(contents)
        for name, offset, size in index:
            assert size == len(contents[name])

    def test_reads_match(self, sample_tar):
        path, contents = sample_tar
        for name, offset, size in native_tar.index_tar(path):
            data = native_tar.read_member(path, offset, size)
            assert data == contents[name], f"mismatch for {name}"

    def test_dataset_uses_native_path(self, sample_tar, tmp_path):
        """TarShardDataset yields identical samples through both backends."""
        from .synthetic import make_shards
        from acav100m_tpu.data.tar_dataset import TarShardDataset
        from acav100m_tpu.data.meta import load_metadata

        spec = make_shards(tmp_path, num_shards=1, clips_per_shard=3)
        shard = tmp_path / "shard-000000.tar"
        metas, _ = load_metadata([shard])
        ds = TarShardDataset([shard], metas)
        native_rows = {r["filename"]: r for r in ds}
        # force the tarfile fallback
        import acav100m_tpu.data.native_tar as nt

        orig = nt.available
        nt.available = lambda: False
        try:
            fallback_rows = {r["filename"]: r for r in TarShardDataset([shard], metas)}
        finally:
            nt.available = orig
        assert set(native_rows) == set(fallback_rows) and len(native_rows) == 3
        for k in native_rows:
            np.testing.assert_array_equal(
                native_rows[k]["frames"], fallback_rows[k]["frames"]
            )

"""Executable parity of the FULL stage-4 driver vs the REFERENCE's own
``feature_extraction/code/run_extraction.py`` (round-3 VERDICT missing #3:
the last un-oracled reference driver).

The reference driver is driven END-TO-END on CPU torch with its real
``get_dataloader`` → ``get_dataset`` pipeline (data/webdataset.py:39-121):
real ``get_shards_path``/``load_metadata`` (tar∩meta shard sizes), real
``MetaWebDataset`` tar streaming + skip-lists over a faithful
webdataset-0.1 ``Dataset`` shim (reference_oracle), real ``ResizedDataset``
length equalization, real ``collate``/``extract_batch``/``save_output``.
Only two surfaces are injected, identically on both sides:

* decode — ``load_video_webdata`` replaced by an npz reader (PyAV is
  absent in-image); the repo runs its npz decoder on the same bytes;
* models — deterministic fakes whose layer features are EXACT functions
  of the clip bytes (uint8 pixels / dyadic-rational audio samples scaled
  by small integers), so both frameworks produce bit-identical float32
  arrays and the pkl rows compare with exact equality.

Parity claims (reference run_extraction.py:23-134, save.py:20-133,
data/metawebdataset.py:7-74):

* identical saved shard pkls: same shards saved, same row order, same
  meta fields, same model/extractor/dataset keys, bit-equal layer arrays;
* identical ``shard_ok_ratio`` flush decisions — a shard with one
  undecodable clip is flushed at ratio 0.8 and held (cache only) at 0.99;
* identical ``_cache.pkl`` resume behavior — pre-seeded cache rows are
  skip-listed (never re-decoded, asserted via decode trackers on both
  sides) and appear first in the final output;
* the cache file is removed when its shard's final pkl is saved.

Pinned naming quirk: the reference's row ``filename`` is the webdataset
``__key__`` (EXTENSIONLESS, data/webdataset.py:21-28) while the repo keeps
the tar member name with extension; every downstream consumer keys on the
stem (reference utils.get_idx, repo utils/io.py), so rows are compared by
stem.
"""

from __future__ import annotations

import io
import json
import pickle
import tarfile
from collections import OrderedDict
from pathlib import Path

import numpy as np
import pytest

from tests import reference_oracle as ro

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="reference not present"
)

NUM_FRAMES = 4
SIZE = 8
DURATION = 1.0
SR = 16000
FPS = 4.0
BATCH = 4
CLIPS_PER_SHARD = 6
SPEC = "shard-{000000..000001}.tar"

VID_LAYERS = 2
AUD_LAYERS = 2


def clip_stem(shard_idx: int, clip_idx: int) -> str:
    # 12-char id + start offset digit: _get_name parses
    # start = int(key[id_len:]) with id_len=12 (data/webdataset.py:21-26)
    return f"v{shard_idx:05d}c{clip_idx:04d}z0"


def make_clip_npz(rng) -> bytes:
    frames = rng.randint(0, 255, (NUM_FRAMES, SIZE, SIZE, 3)).astype(np.uint8)
    # dyadic-rational audio samples: exact in f32 on both frameworks
    audio = (rng.randint(0, 256, SR).astype(np.float32)) / 16.0
    buf = io.BytesIO()
    np.savez(buf, frames=frames, audio=audio, sample_rate=SR,
             video_fps=FPS)
    return buf.getvalue()


def expected_layers(npz_bytes: bytes):
    """The fake models' exact outputs, computed independently in numpy."""
    with np.load(io.BytesIO(npz_bytes)) as z:
        vid_sig = z["frames"][0, 0, :8, 0].astype(np.float32)
        aud_sig = z["audio"][:6].astype(np.float32)
    return (
        [aud_sig * float(j + 1) for j in range(AUD_LAYERS)],
        [vid_sig * float(j + 1) for j in range(VID_LAYERS)],
    )


def build_fixture(root: Path, corrupt_stems=()):
    """Tar shards of npz clips + shard meta jsons (the stage-3 contract)."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(4242)
    payloads = {}
    for s in range(2):
        shard_name = f"shard-{s:06d}"
        meta = []
        with tarfile.open(root / f"{shard_name}.tar", "w") as tf:
            for c in range(CLIPS_PER_SHARD):
                stem = clip_stem(s, c)
                data = (b"THIS-IS-NOT-AN-NPZ" if stem in corrupt_stems
                        else make_clip_npz(rng))
                payloads[stem] = data
                info = tarfile.TarInfo(f"{stem}.mp4")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                meta.append({"filename": f"{stem}.mp4", "id": stem,
                             "segment": [0.0, DURATION]})
        (root / f"{shard_name}.json").write_text(json.dumps(meta))
    return payloads


# -- reference side ------------------------------------------------------------

class RefFakeModel:
    def __init__(self, kind):
        self.kind = kind
        self.model_tag = {
            "name": "FakeVid" if kind == "video" else "FakeAud",
            "dataset": "synthetic",
        }

    def get_preprocessor(self):
        kind = self.kind

        def preprocessor(res_visual, res_audio):
            visual, _fps = res_visual
            audio, _sr = res_audio
            if kind == "video":
                return {"data": visual[0, 0, :8, 0].to(torch.float32)}
            return {"data": audio[:6].to(torch.float32)}

        return preprocessor

    def __call__(self, data):  # (B, 8) or (B, 6) float32
        n = VID_LAYERS if self.kind == "video" else AUD_LAYERS
        return [data * float(j + 1) for j in range(n)]


def _mods():
    with ro.shim_absent_modules("av", "torchvision"):
        return ro.import_stage(
            "feature_extraction",
            ("run_extraction", "data.webdataset", "save", "utils"),
        )


def run_reference(data_dir: Path, out_dir: Path, shard_ok_ratio: float,
                  decoded_tracker: list):
    mods = _mods()
    run_mod = mods["run_extraction"]
    wds_mod = mods["data.webdataset"]
    out_dir.mkdir(parents=True, exist_ok=True)

    def fake_load_video(data, num_frames, duration=None,
                        skip_shorter_seconds=None):
        z = np.load(io.BytesIO(data))  # raises on corrupt -> handler drops
        visual = torch.from_numpy(np.asarray(z["frames"]))
        audio = torch.from_numpy(np.asarray(z["audio"]))
        fps = float(z["video_fps"])
        decoded_tracker.append(
            visual[0, 0, :8, 0].numpy().astype(np.float32).tobytes())
        return (visual, fps / num_frames), (audio, SR)

    def fake_get_model(name, args):
        return RefFakeModel("video" if "video" in name else "audio"), args

    args = ro.make_extraction_args(
        data_dir, out_dir, SPEC, batch_size=BATCH, num_frames=NUM_FRAMES,
        duration=DURATION, shard_ok_ratio=shard_ok_ratio,
    )
    orig_load = wds_mod.load_video_webdata
    orig_get_model = run_mod.get_model
    wds_mod.load_video_webdata = fake_load_video
    run_mod.get_model = fake_get_model
    try:
        with ro.stage_context("feature_extraction"):
            saved = run_mod.run_extraction(args)
    finally:
        wds_mod.load_video_webdata = orig_load
        run_mod.get_model = orig_get_model
    return [Path(p) for p in saved]


# -- repo side -------------------------------------------------------------------

class RepoFakeVideo:
    media_type = "video"
    model_tag = {"name": "FakeVid", "dataset": "synthetic"}

    def apply(self, params, frames):
        sig = frames[:, 0, 0, :8, 0].astype(jnp.float32)
        return [sig * float(j + 1) for j in range(VID_LAYERS)]


class RepoFakeAudio:
    media_type = "audio"
    model_tag = {"name": "FakeAud", "dataset": "synthetic"}

    def apply(self, params, audio, valid_samples):
        sig = audio[:, :6].astype(jnp.float32)
        return [sig * float(j + 1) for j in range(AUD_LAYERS)]


def run_repo(data_dir: Path, out_dir: Path, shard_ok_ratio: float,
             decoded_tracker: list):
    from acav100m_tpu.data.video import decode_npz
    from acav100m_tpu.pipeline import feature_extraction as fe

    def tracking_decoder(data: bytes):
        d = decode_npz(data)
        if d is None:
            raise ValueError("corrupt clip")
        decoded_tracker.append(
            d["frames"][0, 0, :8, 0].astype(np.float32).tobytes())
        return d

    cfg = fe.get_config({
        "models": ["fake_audio", "fake_video"],
        "model_types.audio": ["fake_audio"],
        "data.media.path": str(data_dir / SPEC),
        "data.media.num_frames": NUM_FRAMES,
        "data.batch_size": BATCH,
        "data.output.path": str(out_dir),
        "data.output.shard_ok_ratio": shard_ok_ratio,
        "acav.duration": DURATION,
        "computation.device_prefetch": 0,
    })
    models = OrderedDict(
        [("fake_audio", RepoFakeAudio()), ("fake_video", RepoFakeVideo())]
    )
    params = {"fake_audio": {}, "fake_video": {}}
    return fe.run_extraction(
        cfg, decoder=tracking_decoder, models=models, params=params
    )


# -- canonical comparison --------------------------------------------------------

def canon_rows(pkl_path: Path):
    with open(pkl_path, "rb") as f:
        rows = pickle.load(f)
    out = []
    for row in rows:
        feats = {}
        for side in ("video_features", "audio_features"):
            for f_ in row[side]:
                key = (side, f_["model_key"], f_["extractor_name"],
                       f_["dataset"])
                assert key not in feats
                feats[key] = {
                    k: np.asarray(v, dtype=np.float32)
                    for k, v in f_["array"].items()
                }
        out.append({
            "stem": Path(row["filename"]).stem,
            "shard_name": row["shard_name"],
            "shard_size": int(row["shard_size"]),
            "feats": feats,
        })
    return out


def assert_rows_equal(ref_rows, my_rows):
    assert [r["stem"] for r in ref_rows] == [r["stem"] for r in my_rows]
    for ref, mine in zip(ref_rows, my_rows):
        assert ref["shard_name"] == mine["shard_name"]
        assert ref["shard_size"] == mine["shard_size"]
        assert set(ref["feats"]) == set(mine["feats"]), ref["stem"]
        for key, arrs in ref["feats"].items():
            assert set(arrs) == set(mine["feats"][key])
            for layer, arr in arrs.items():
                np.testing.assert_array_equal(
                    arr, mine["feats"][key][layer],
                    err_msg=f"{ref['stem']} {key} {layer}",
                )


@pytest.mark.slow
@pytest.mark.parametrize("ratio,expect_partial_saved", [
    (0.8, True),   # 5/6 rows >= round(6*0.8)=5 -> flushed
    (0.99, False),  # 5 < round(6*0.99)=6 -> held as cache only
])
def test_stage4_driver_parity_full_pass(tmp_path, ratio,
                                        expect_partial_saved):
    corrupt = {clip_stem(1, 3)}  # one undecodable clip in shard-000001
    data_dir = tmp_path / "shards"
    build_fixture(data_dir, corrupt_stems=corrupt)

    ref_decoded, my_decoded = [], []
    ref_saved = run_reference(data_dir, tmp_path / "ref", ratio, ref_decoded)
    my_saved = run_repo(data_dir, tmp_path / "mine", ratio, my_decoded)

    want = ["shard-000000.pkl"] + (
        ["shard-000001.pkl"] if expect_partial_saved else []
    )
    assert sorted(p.name for p in ref_saved) == want
    assert sorted(p.name for p in my_saved) == want

    for name in want:
        assert_rows_equal(
            canon_rows(tmp_path / "ref" / name),
            canon_rows(tmp_path / "mine" / name),
        )
        # cache removed once the final pkl is saved (save.py:24-33)
        stem = Path(name).stem
        assert not (tmp_path / "mine" / f"{stem}_cache.pkl").exists()

    # QUIRK PIN (discovered by this drive): the reference re-writes a STALE
    # _cache.pkl for an already-saved shard when ResizedDataset wraps — the
    # wrap-around duplicate of the first sample looks new because
    # save_shard deleted the shard's ids entry (run_extraction.py:56-64,
    # 89-96), and the per-iter save_cache runs BEFORE the pkl-exists check
    # (run_extraction.py:103-107). 11 real samples resized to length 12
    # re-yield exactly sample one. The repo loader yields each clip once,
    # so no stale cache — deliberate divergence.
    stale = tmp_path / "ref" / "shard-000000_cache.pkl"
    assert stale.exists()
    assert [r["stem"] for r in canon_rows(stale)] == [clip_stem(0, 0)]
    assert not (tmp_path / "ref" / "shard-000001_cache.pkl").exists() \
        or not expect_partial_saved

    if not expect_partial_saved:
        # the partial shard is held as a cache on BOTH sides, with
        # identical (canonically compared) rows
        ref_cache = tmp_path / "ref" / "shard-000001_cache.pkl"
        my_cache = tmp_path / "mine" / "shard-000001_cache.pkl"
        assert ref_cache.exists() and my_cache.exists()
        assert not (tmp_path / "ref" / "shard-000001.pkl").exists()
        assert not (tmp_path / "mine" / "shard-000001.pkl").exists()
        assert_rows_equal(canon_rows(ref_cache), canon_rows(my_cache))

    # both sides decoded the same clip set (ResizedDataset wrap-around may
    # re-decode duplicates on the reference side — compare as sets)
    assert set(ref_decoded) == set(my_decoded)
    assert len(set(ref_decoded)) == 11  # 12 clips - 1 corrupt


def _seed_caches(payloads, ref_out: Path, my_out: Path, stems, shard_name):
    """Handcraft identical resume caches in each side's own convention:
    the reference's row filename is the extensionless __key__, the repo's
    keeps the member extension (quirk pinned in the module docstring)."""
    from acav100m_tpu.utils.io import make_feature_row, save_shard_cache

    ref_rows, my_rows = [], []
    for stem in stems:
        aud, vid = expected_layers(payloads[stem])
        per_model = [
            {"model_key": "fake_audio", "extractor_name": "FakeAud",
             "dataset": "synthetic", "array": list(aud)},
            {"model_key": "fake_video", "extractor_name": "FakeVid",
             "dataset": "synthetic", "array": list(vid)},
        ]
        ref_rows.append(make_feature_row(
            stem, shard_name, CLIPS_PER_SHARD, per_model, ["fake_audio"]))
        my_rows.append(make_feature_row(
            f"{stem}.mp4", shard_name, CLIPS_PER_SHARD, per_model,
            ["fake_audio"]))
    ref_out.mkdir(parents=True, exist_ok=True)
    my_out.mkdir(parents=True, exist_ok=True)
    save_shard_cache(ref_rows, ref_out, shard_name)
    save_shard_cache(my_rows, my_out, shard_name)


@pytest.mark.slow
def test_stage4_driver_parity_cache_resume(tmp_path):
    """Pre-seeded _cache.pkl rows are skip-listed on BOTH sides: never
    re-decoded (tracker-asserted), seeded first into the output, and the
    final pkls still compare row-for-row."""
    data_dir = tmp_path / "shards"
    payloads = build_fixture(data_dir)
    cached = [clip_stem(0, 0), clip_stem(0, 1)]
    _seed_caches(payloads, tmp_path / "ref", tmp_path / "mine", cached,
                 "shard-000000")

    ref_decoded, my_decoded = [], []
    ref_saved = run_reference(data_dir, tmp_path / "ref", 0.99, ref_decoded)
    my_saved = run_repo(data_dir, tmp_path / "mine", 0.99, my_decoded)

    want = ["shard-000000.pkl", "shard-000001.pkl"]
    assert sorted(p.name for p in ref_saved) == want
    assert sorted(p.name for p in my_saved) == want

    # the cached clips were never decoded on either side
    cached_sigs = set()
    for stem in cached:
        with np.load(io.BytesIO(payloads[stem])) as z:
            cached_sigs.add(
                z["frames"][0, 0, :8, 0].astype(np.float32).tobytes())
    assert not (cached_sigs & set(ref_decoded))
    assert not (cached_sigs & set(my_decoded))

    for name in want:
        ref_rows = canon_rows(tmp_path / "ref" / name)
        my_rows = canon_rows(tmp_path / "mine" / name)
        assert_rows_equal(ref_rows, my_rows)
    # cached rows first, tar order after (both sides)
    s0 = canon_rows(tmp_path / "mine" / "shard-000000.pkl")
    assert [r["stem"] for r in s0][:2] == cached
    assert [r["stem"] for r in s0] == [clip_stem(0, c)
                                       for c in range(CLIPS_PER_SHARD)]

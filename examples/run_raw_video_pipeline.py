"""The COMPLETE ACAV pipeline — stages 1→6 — on REAL compressed media,
end to end, with no external binaries and no egress:

  1. metadata filtering   tsv catalog -> kept rows      (filter rule chain)
  2. video download       url list -> {vid}.mp4         (offline source_dir)
  3. clip segmentation    SBD + diversity -> 10 s clips (native scdet + -c copy)
  +  bundling             clips -> tar shards + jsons
  4. feature extraction   mp4+AAC -> SlowFast/VGGish    (native decode, TPU)
  5. clustering           features -> centroid ids      (SGD k-means, TPU)
  6. subset selection     batched greedy MI -> output.csv

The raw videos are synthesized in-process (multi-scene mpeg4 video with a
distinct AAC tone per scene, ``native/avio.cc`` encoders), so the demo is
hermetic: every stage runs on real compressed media exactly as production
would, just smaller. Reference flow: ``/root/reference/README.md`` stage
list; per-stage counterparts cited in each pipeline module.

    python examples/run_raw_video_pipeline.py [workdir]
"""

import json
import random
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# -- raw media synthesis ------------------------------------------------------------

def synth_scene_video(path, scenes=3, scene_seconds=11.0, fps=10.0,
                      size=96, seed=0, sample_rate=16000):
    """A real mp4 (mpeg4+AAC) with ``scenes`` visually distinct scenes and
    a distinct audio tone per scene — hard cuts the scdet SBD must find."""
    from acav100m_tpu.data import native_av

    rng = np.random.RandomState(seed)
    n_per = int(round(scene_seconds * fps))
    y = np.arange(size)[None, :, None]
    x = np.arange(size)[None, None, :]
    frames, audio = [], []
    for s in range(scenes):
        t = np.arange(n_per)[:, None, None]
        # per-scene texture: alternating dark/bright luma base (a hard cut
        # the scdet mafd score cannot miss) + varied gradient orientation
        fx, fy = rng.randint(1, 4, size=2)
        ph = rng.uniform(0, 2 * np.pi)
        # slow pan: scdet's score is differential (min(mafd, |Δmafd|),
        # native/avio.cc:349-352) — within-scene motion must stay well
        # below the cut's luma flip for the boundary to register
        base = 60 if s % 2 == 0 else 190
        r = base + 55 * np.sin(2 * np.pi * (fx * x + 0.5 * t) / size + ph)
        g = base + 55 * np.cos(2 * np.pi * (fy * y + 0.5 * t) / size + ph)
        b = 255 - r
        frames.append(np.stack(
            [np.broadcast_to(c, (n_per, size, size)) for c in (r, g, b)],
            axis=-1).astype(np.uint8))
        freq = 220.0 * (2 ** ((s + seed) % 4))
        ts = np.arange(int(scene_seconds * sample_rate)) / sample_rate
        audio.append((0.4 * np.sin(2 * np.pi * freq * ts)).astype(np.float32))
    ok = native_av.encode_mp4(path, np.concatenate(frames), fps=fps,
                              audio=np.concatenate(audio),
                              sample_rate=sample_rate)
    if not ok:
        raise RuntimeError(f"mp4 encode failed: {path}")
    return path


def make_catalog(source_dir, tsv_path, n_videos=4, seconds_per_scene=11.0,
                 scenes=3, fps=10.0, size=96, seed=0):
    """Synthesize the raw-video corpus + the stage-1 metadata tsv.

    The tsv uses the reference's row shape (``vid\\tjson`` with
    ``LatestDAFeature``, filter.py:79-121) and includes rows engineered to
    be REJECTED (gaming category, too-short duration, keyword hit) so the
    filter demonstrably gates."""
    source_dir = Path(source_dir)
    source_dir.mkdir(parents=True, exist_ok=True)
    duration = int(seconds_per_scene * scenes)
    rows = []
    for i in range(n_videos):
        vid = f"rawvid{i:04d}"
        synth_scene_video(source_dir / f"{vid}.mp4", scenes=scenes,
                          scene_seconds=seconds_per_scene, fps=fps,
                          size=size, seed=seed + i)
        rows.append((vid, {
            "LatestDAFeature": {
                "Title": f"a quiet walk through the old town part {i}",
                "Description": "we film the streets and the river "
                               "and talk about the houses",
                "YouTubeCategory": "Travel & Events",
                "VideoLength": str(duration + 1),  # VideoLength = dur + 1
            }}))
    # rows the stage-1 filter must reject
    rows.append(("rejgame", {"LatestDAFeature": {
        "Title": "epic gameplay montage", "Description": "pure gaming",
        "YouTubeCategory": "Gaming", "VideoLength": str(duration + 1)}}))
    rows.append(("rejshort", {"LatestDAFeature": {
        "Title": "a quiet walk through the old town",
        "Description": "so short", "YouTubeCategory": "Travel & Events",
        "VideoLength": "8"}}))
    rows.append(("rejkeyword", {"LatestDAFeature": {
        "Title": "minecraft speedrun walkthrough highlights",
        "Description": "a full walkthrough of the run",
        "YouTubeCategory": "Travel & Events",
        "VideoLength": str(duration + 1)}}))
    with open(tsv_path, "w") as f:
        for vid, payload in rows:
            f.write(f"{vid}\t{json.dumps(payload)}\n")
    return tsv_path


# -- the pipeline -------------------------------------------------------------------

def run(workdir=None, n_videos=4, scenes=3, scene_seconds=11.0, fps=10.0,
        size=96, num_clips=3, batch_size=4, ncentroids=4, subset_ratio=0.75,
        seed=0, log=print):
    """Stages 1→6 in-process. Returns a dict of per-stage artifacts."""
    from acav100m_tpu.data.video import NativeAvDecoder
    from acav100m_tpu.pipeline import clustering as cl
    from acav100m_tpu.pipeline import feature_extraction as fe
    from acav100m_tpu.pipeline import subset_selection as ss
    from acav100m_tpu.pipeline.bundling import bundle_shards, check_output
    from acav100m_tpu.pipeline.clip_segmentation import (
        open_video_backend,
        segment_video,
    )
    from acav100m_tpu.pipeline.metadata_filtering import run_file
    from acav100m_tpu.pipeline.video_download import run_download

    root = Path(workdir or tempfile.mkdtemp(prefix="acav_raw_"))
    log(f"workdir: {root}")
    out = {"workdir": root}

    # corpus + catalog
    source = root / "source"
    catalog = make_catalog(source, root / "catalog.tsv", n_videos=n_videos,
                           seconds_per_scene=scene_seconds, scenes=scenes,
                           fps=fps, size=size, seed=seed)

    # stage 1: metadata filtering
    kept_tsv = root / "filtered.tsv"
    kept, total = run_file(catalog, kept_tsv)
    log(f"stage 1: kept {kept}/{total} catalog rows")
    out["filtered"] = (kept, total)

    # stage 1 -> 2 glue: url list for the kept rows (the reference's
    # users feed the downloader from the filtered tsv the same way)
    url_list = root / "urls.tsv"
    with open(kept_tsv) as f, open(url_list, "w") as g:
        for line in f:
            vid = line.split("\t", 1)[0]
            g.write(f"https://www.youtube.com/watch?v={vid}\n")

    # stage 2: download (offline copy backend — no egress)
    videos = root / "videos"
    ok, want = run_download(url_list, videos, source_dir=source)
    log(f"stage 2: downloaded {ok}/{want} videos")
    out["downloaded"] = (ok, want)

    # stage 3: clip segmentation (native scdet SBD + stream-copy clips)
    clips_dir = root / "clips"
    rng = random.Random(seed)
    clip_paths = []
    for path in sorted(videos.glob("*.mp4")):
        backend = open_video_backend(path)
        _, paths = segment_video(backend, clips_dir, path.stem,
                                 num_clips=num_clips, rng=rng)
        clip_paths.extend(paths)
    log(f"stage 3: extracted {len(clip_paths)} clips "
        f"from {ok} videos ({type(backend).__name__})")
    out["clips"] = clip_paths

    # stage 3 -> 4: bundle tar shards + metadata jsons
    shards_dir = root / "shards"
    shard_size = max(2, (len(clip_paths) + 1) // 2)
    shards = bundle_shards(clip_paths, shards_dir, shard_size=shard_size)
    spec = str(shards_dir / (
        f"shard-{{{shards[0].stem.split('-')[1]}..{shards[-1].stem.split('-')[1]}}}.tar"
        if len(shards) > 1 else shards[0].name))
    log(f"bundled {len(shards)} shards")
    out["shards"] = shards

    # stage 4: feature extraction (native mp4+AAC decode, 32-frame sampling)
    fcfg = fe.get_config({
        "data.media.path": spec,
        "data.output.path": str(root / "features"),
        "data.batch_size": batch_size,
    })
    decoder = NativeAvDecoder(size=size, sample_rate=16000, sample_frames=32)
    feature_pkls = fe.run_extraction(fcfg, decoder=decoder)
    audit = check_output(root / "features", shards_dir)
    assert audit["ok"], f"extraction audit failed: {audit}"
    log(f"stage 4: extracted {len(feature_pkls)} feature shards "
        f"(audit ok, {sum(s['rows'] for s in audit['shards'].values())} rows)")
    out["features"] = feature_pkls

    pkl_spec = spec.replace(str(shards_dir), str(root / "features"))
    pkl_spec = pkl_spec[: pkl_spec.rfind(".tar")] + ".pkl"

    # stage 5: clustering
    ccfg = cl.get_config({
        "data.path": pkl_spec,
        "data.output.path": str(root / "clusters"),
        "data.batch_size": batch_size,
        "clustering.ncentroids": ncentroids,
    })
    assignment_pkls = cl.run_clustering(ccfg)
    log(f"stage 5: wrote {len(assignment_pkls)} assignment shards")
    out["assignments"] = assignment_pkls

    # stage 6: subset selection
    n_total = len(clip_paths)
    sel_batch = max(4, n_total // 2)
    scfg = ss.get_config({
        "data.path": pkl_spec.replace(str(root / "features"),
                                      str(root / "clusters")),
        "data.output.path": str(root / "output.csv"),
        "data.meta.path": str(shards_dir),
        "subset.ratio": subset_ratio,
        "batch.batch_size": sel_batch,
        "batch.selection_size": max(2, int(sel_batch * subset_ratio)),
    })
    csv_path, count = ss.run(scfg)
    log(f"stage 6: selected {count} clips -> {csv_path}")
    out["csv"] = Path(csv_path)
    out["selected"] = count
    return out


if __name__ == "__main__":
    result = run(sys.argv[1] if len(sys.argv) > 1 else None)
    print(result["csv"].read_text())

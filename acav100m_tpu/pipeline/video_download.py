"""Stage 2 — video download (filtered.tsv -> raw mp4s).

Rebuild of ``video_download/code/run.py:26-41``: one yt-dlp/youtube-dl
fetch per row, mp4 merge, skip-if-exists, swallow download errors. Download
is inherently host/network work; in a no-egress environment the stage
degrades to the ``copy`` backend (local source directory), which the tests
use.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path
from typing import Iterator, List, Optional, Tuple


def iter_video_ids(tsv_path) -> Iterator[Tuple[str, str]]:
    """(url, vid) per row; vid is the url basename like the reference."""
    with open(tsv_path) as f:
        for line in f:
            parts = line.strip().split("\t")
            if not parts or not parts[0]:
                continue
            url = parts[0]
            vid = url.split("v=")[-1].split("&")[0] if "v=" in url else Path(url).name
            yield url, vid


def load_urls(tsv_path) -> "dict[str, str]":
    """{vid: url} with the reference's exact semantics (run.py:16-23):
    first tab field is the url, vid is its last 11 characters (the YouTube
    watch id), and the dict keying dedupes repeated ids — each vid is
    attempted at most once per run."""
    urls: "dict[str, str]" = {}
    with open(tsv_path) as f:
        for line in f:
            url = line.split("\t")[0]
            if url:
                urls[url[-11:]] = url
    return urls


def find_downloader() -> Optional[List[str]]:
    for cand in ("yt-dlp", "youtube-dl"):
        exe = shutil.which(cand)
        if exe:
            return [exe]
    return None


def download_one(url: str, out_path: Path, downloader: List[str]) -> bool:
    if out_path.is_file():
        return True
    cmd = downloader + [
        "-f", "mp4", "--merge-output-format", "mp4",
        "-o", str(out_path), url,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=600)
        return proc.returncode == 0 and out_path.is_file()
    except Exception:
        return False


def run_download(tsv_path, out_dir, source_dir=None,
                 fetch_fn=None) -> Tuple[int, int]:
    """Download every row's video to ``out_dir``; skip existing, swallow
    errors, one attempt per vid (reference run.py:26-41 iterates a
    vid-keyed dict, so duplicate rows collapse — replicated here, verified
    against the reference's own run.py in
    tests/test_video_download_reference_parity.py). ``source_dir`` enables
    the offline copy backend; ``fetch_fn(url, out_path) -> bool`` injects a
    fetch backend (tests). Returns (ok, total distinct vids)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    downloader = None if fetch_fn is not None else find_downloader()
    seen = set()
    ok = total = 0
    for url, vid in iter_video_ids(tsv_path):
        if vid in seen:
            continue
        seen.add(vid)
        total += 1
        out_path = out_dir / f"{vid}.mp4"
        if out_path.is_file():
            ok += 1
            continue
        if fetch_fn is not None:
            try:
                if fetch_fn(url, out_path) and out_path.is_file():
                    ok += 1
            except Exception:
                pass  # swallow download errors (run.py:36-37)
            continue
        if source_dir is not None:
            src = Path(source_dir) / f"{vid}.mp4"
            if src.is_file():
                shutil.copy(src, out_path)
                ok += 1
            continue
        if downloader is None:
            continue  # no network tooling: skip-and-continue
        if download_one(url, out_path, downloader):
            ok += 1
    return ok, total

"""Downstream dataset + checkpoint fetchers.

Port of the reference's ``evaluation/download_*.py`` scripts. All of these
need network egress; in a no-egress image they raise with instructions and
the loaders fall back to pre-materialized npz clip directories
(``evaluation.data.ClipClassificationDataset``).

Datasets (reference evaluation/README.md):
* UCF101 — 3 train/test splits, video classification;
* ESC-50 — 5 folds, audio-only classification;
* Kinetics-Sounds — audio-visual subset of Kinetics-400;
* ACAV-pretrained checkpoint for linear eval.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path
from typing import Optional

URLS = {
    "ucf101": "https://www.crcv.ucf.edu/data/UCF101/UCF101.rar",
    "ucf101_splits": (
        "https://www.crcv.ucf.edu/data/UCF101/UCF101TrainTestSplits-RecognitionTask.zip"
    ),
    "esc50": "https://github.com/karolpiczak/ESC-50/archive/master.zip",
    # Kinetics-Sounds is a subset of Kinetics-400; clips are fetched per
    # video id with yt-dlp from the official annotation list.
    "kinetics400_annotations": (
        "https://s3.amazonaws.com/kinetics/400/annotations/train.csv"
    ),
}


class DownloadUnavailable(RuntimeError):
    pass


def _fetch(url: str, out_path: Path) -> Path:
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if out_path.is_file():
        return out_path
    for tool, args in (
        ("wget", ["-q", "-O", str(out_path), url]),
        ("curl", ["-sL", "-o", str(out_path), url]),
    ):
        exe = shutil.which(tool)
        if exe:
            proc = subprocess.run([exe] + args, capture_output=True, timeout=3600)
            if proc.returncode == 0 and out_path.is_file():
                return out_path
            out_path.unlink(missing_ok=True)
    raise DownloadUnavailable(
        f"cannot fetch {url} (no egress or no wget/curl); pre-materialize "
        f"the dataset as npz clips + labels.json instead — see "
        f"evaluation.data.ClipClassificationDataset"
    )


def download_ucf101(out_dir) -> Path:
    out_dir = Path(out_dir)
    _fetch(URLS["ucf101_splits"], out_dir / "splits.zip")
    return _fetch(URLS["ucf101"], out_dir / "UCF101.rar")


def download_esc50(out_dir) -> Path:
    return _fetch(URLS["esc50"], Path(out_dir) / "esc50.zip")


def download_kinetics_sounds_annotations(out_dir) -> Path:
    return _fetch(
        URLS["kinetics400_annotations"], Path(out_dir) / "kinetics400_train.csv"
    )

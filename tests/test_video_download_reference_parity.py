"""Executable parity of stage 2 (video_download) vs the REFERENCE's own
``video_download/code/run.py``, with the network boundary injected.

The reference stage is a thin youtube-dl driver: ``load_data`` keys a dict
by the url's last 11 characters (the YouTube watch id — duplicate rows
collapse), ``download`` skips vids whose mp4 already exists and swallows
``DownloadError`` (run.py:16-41).  Egress is unavailable in-image, so the
oracle runs the reference code with a FAKE ``youtube_dl`` module installed
in ``sys.modules`` (records every attempted vid, honors the ``outtmpl``,
raises ``DownloadError`` for designated ids) and the repo runs
``run_download`` with an equivalent injected ``fetch_fn``.  Parity claims:

* ``load_urls`` == the reference's ``load_data`` mapping exactly;
* identical attempted-download sequences (dedupe + skip-if-exists);
* identical resulting file sets (failures swallowed, not written).

Reference: ``video_download/code/run.py:16-41``.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import pytest

from tests import reference_oracle as ro

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="reference not present"
)

VIDS = [
    "aaaaaaaaaa1",  # plain success
    "bbbbbbbbbb2",  # duplicated row — must be attempted once
    "cccccccccc3",  # pre-existing mp4 — must not be attempted
    "dddddddddd4",  # DownloadError — swallowed, no file
    "eeeeeeeeee5",  # plain success
]
FAIL = {"dddddddddd4"}
PRESENT = {"cccccccccc3"}

# One shared recorder: import_stage caches the reference module, whose
# module-level `youtube_dl` binding is the FIRST installed fake — so the
# fake must outlive individual tests and record into one global list.
REF_CALLS: list = []


def write_tsv(path: Path):
    rows = [f"https://www.youtube.com/watch?v={v}" for v in VIDS]
    rows.insert(2, rows[1])  # duplicate bbbbbbbbbb2
    path.write_text("".join(f"{u}\t{{}}\n" for u in rows))


def install_fake_youtube_dl():
    if "youtube_dl" in sys.modules and hasattr(
        sys.modules["youtube_dl"], "_acav_fake"
    ):
        return sys.modules["youtube_dl"]
    calls = REF_CALLS
    utils = types.ModuleType("youtube_dl.utils")

    class DownloadError(Exception):
        pass

    utils.DownloadError = DownloadError
    mod = types.ModuleType("youtube_dl")

    class YoutubeDL:
        def __init__(self, opts):
            self.opts = opts

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def download(self, urls):
            for url in urls:
                vid = url[-11:]
                calls.append(vid)
                if vid in FAIL:
                    raise DownloadError(f"simulated failure for {vid}")
                out = Path(self.opts["outtmpl"] % {"id": vid, "ext": "mp4"})
                out.write_bytes(b"payload-" + vid.encode())

    mod.YoutubeDL = YoutubeDL
    mod.utils = utils
    mod._acav_fake = True
    sys.modules["youtube_dl"] = mod
    sys.modules["youtube_dl.utils"] = utils
    return mod


def seed_outdir(out: Path):
    out.mkdir(parents=True, exist_ok=True)
    for v in PRESENT:
        (out / f"{v}.mp4").write_bytes(b"already-here")


def test_stage2_parity(tmp_path):
    from acav100m_tpu.pipeline.video_download import load_urls, run_download

    tsv = tmp_path / "filtered.tsv"
    write_tsv(tsv)

    install_fake_youtube_dl()
    REF_CALLS.clear()
    ref_run = ro.import_stage("video_download", ["run"])["run"]

    # -- load_data mapping parity ------------------------------------------
    ref_urls = ref_run.load_data(str(tsv))
    assert load_urls(tsv) == ref_urls
    assert list(ref_urls) == VIDS  # dict dedupe keeps first-insertion order

    # -- reference download run --------------------------------------------
    ref_out = tmp_path / "ref"
    seed_outdir(ref_out)
    ref_run.download(ref_urls, ref_out)

    # -- repo download run with the equivalent injected backend -------------
    my_calls: list = []

    from acav100m_tpu.pipeline.video_download import DownloadFailed

    def fetch_fn(url, out_path):
        vid = url[-11:]
        my_calls.append(vid)
        if vid in FAIL:
            raise DownloadFailed(f"simulated failure for {vid}")
        Path(out_path).write_bytes(b"payload-" + vid.encode())
        return True

    my_out = tmp_path / "mine"
    seed_outdir(my_out)
    ok, total = run_download(tsv, my_out, fetch_fn=fetch_fn)

    # -- parity claims -------------------------------------------------------
    assert my_calls == REF_CALLS  # dedupe + skip-if-exists + order
    assert "cccccccccc3" not in my_calls
    ref_files = {p.name: p.read_bytes() for p in ref_out.iterdir()}
    my_files = {p.name: p.read_bytes() for p in my_out.iterdir()}
    assert my_files == ref_files
    assert "dddddddddd4.mp4" not in my_files  # failure swallowed, no file
    assert (ok, total) == (4, 5)  # 5 distinct vids, 1 swallowed failure


def test_duplicate_vid_last_url_wins_like_reference(tmp_path):
    """Reference ``load_data`` is a dict overwrite: when two rows map to
    the same vid, the LAST row's url is the one attempted (run.py:16-23).
    The repo's production driver now shares that semantics (round-3
    ADVICE: the old seen-set kept the FIRST url)."""
    from acav100m_tpu.pipeline.video_download import run_download

    tsv = tmp_path / "filtered.tsv"
    tsv.write_text(
        "https://first.example/watch?v=aaaaaaaaaa1\t{}\n"
        "https://later.example/watch?v=aaaaaaaaaa1\t{}\n"
    )
    attempted: list = []
    run_download(tsv, tmp_path / "out",
                 fetch_fn=lambda u, p: attempted.append(u) or False)
    assert attempted == ["https://later.example/watch?v=aaaaaaaaaa1"]


def test_non_download_errors_propagate(tmp_path):
    """The reference swallows ONLY youtube_dl.utils.DownloadError
    (run.py:36-37); a buggy backend (TypeError etc.) must propagate, not
    be silently counted as a failed download (round-3 ADVICE)."""
    from acav100m_tpu.pipeline.video_download import run_download

    tsv = tmp_path / "filtered.tsv"
    tsv.write_text("https://www.youtube.com/watch?v=aaaaaaaaaa1\t{}\n")

    def buggy(url, out_path):
        raise TypeError("backend bug")

    with pytest.raises(TypeError):
        run_download(tsv, tmp_path / "out", fetch_fn=buggy)


def test_second_run_skips_everything(tmp_path):
    """Re-running over a complete output dir attempts nothing on either
    side (the skip-if-exists contract both implementations share)."""
    from acav100m_tpu.pipeline.video_download import run_download

    tsv = tmp_path / "filtered.tsv"
    write_tsv(tsv)
    install_fake_youtube_dl()
    ref_run = ro.import_stage("video_download", ["run"])["run"]
    REF_CALLS.clear()

    out = tmp_path / "full"
    out.mkdir()
    for v in VIDS:
        (out / f"{v}.mp4").write_bytes(b"done")
    ref_run.download(ref_run.load_data(str(tsv)), out)
    assert REF_CALLS == []

    my_calls: list = []
    ok, total = run_download(
        tsv, out, fetch_fn=lambda u, p: my_calls.append(u) or True
    )
    assert my_calls == []
    assert (ok, total) == (5, 5)

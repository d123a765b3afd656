import json
import subprocess
import sys

import pytest

from acav100m_tpu.cli import main
from .test_stages123 import make_row


class TestCli:
    def test_filter_verb(self, tmp_path, capsys):
        rows = [
            make_row(vid="ok1", title="the quick brown fox and the lazy dog"),
            make_row(vid="bad", duration=5),
        ]
        (tmp_path / "in.tsv").write_text("\n".join(rows) + "\n")
        main(["filter", str(tmp_path / "in.tsv"), str(tmp_path / "out.tsv")])
        out = capsys.readouterr().out
        assert "1/2" in out

    def test_select_empty_input_is_graceful(self, tmp_path, capsys):
        # matches the reference's "No files saved" behavior on empty input
        main(["select", "data.path=/nonexistent/shard-{000000..000001}.pkl"])
        assert "added 0 lines" in capsys.readouterr().out

    def test_help_runs_as_module(self):
        proc = subprocess.run(
            [sys.executable, "-m", "acav100m_tpu", "--help"],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        assert proc.returncode == 0
        for verb in ("filter", "extract", "cluster", "select", "retrieval"):
            assert verb in proc.stdout

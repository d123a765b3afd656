"""More executable parity against reference code that runs in this image.

Three additional oracle surfaces, all pure CPU:

* **VGGish log-mel front end** — the reference's own
  ``models/utils_vggish/mel_features.py`` (pure numpy) and
  ``preprocess.py::_preprocess`` (torch + a never-called resampy import,
  stubbed) executed against ``ops/melspec.py``'s GEMM formulation: the mel
  filterbank and periodic-Hann window are compared exactly, framing
  bit-exactly, and the full waveform -> (N, 96, 64) log-mel example stack
  to fp32 tolerance across aligned and ragged clip lengths.
* **Learning-rate policy** — ``evaluation/code/utils/lr_policy.py::get_lr``
  vs ``evaluation.train.lr_schedule`` over every policy, sweeping all
  steps of several (total, warmup) configs. Pins the reference's quirk
  that the LINEAR policy ignores ``warmup_start_lr`` (lr_policy.py:25-27)
  while cosine honors it (:29-33).
* **Shard placement** — ``mps/distributed.py::node_selection`` (incl.
  wrap-around train mode), ``worker_urls`` (driven through a patched
  ``torch.utils.data.get_worker_info``), and ``get_length`` (world size
  injected) vs ``utils/shards.py``.
"""

from __future__ import annotations

import importlib.util
import math
import random
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from tests import reference_oracle as ro

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="reference not present"
)


# -- VGGish front end ---------------------------------------------------------

def vggish_ref():
    """Load the reference's utils_vggish as an isolated package; resampy is
    stubbed (only called when sample_rate != 16000, which these tests never
    do)."""
    if "refvgg.preprocess" in sys.modules:
        return (sys.modules["refvgg.mel_features"],
                sys.modules["refvgg.preprocess"])
    base = ro.REFERENCE / "feature_extraction" / "code" / "models" / "utils_vggish"
    if "resampy" not in sys.modules:
        try:
            importlib.import_module("resampy")
        except ImportError:
            stub = types.ModuleType("resampy")
            stub.resample = None  # never called at 16 kHz
            sys.modules["resampy"] = stub
    pkg = types.ModuleType("refvgg")
    pkg.__path__ = [str(base)]
    sys.modules["refvgg"] = pkg
    mods = {}
    for name in ("mel_features", "preprocess"):
        spec = importlib.util.spec_from_file_location(
            f"refvgg.{name}", base / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refvgg.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods["mel_features"], mods["preprocess"]


class TestVggishFrontendParity:
    def test_mel_matrix_exact(self):
        from acav100m_tpu.ops import melspec

        mf, _ = vggish_ref()
        want = mf.spectrogram_to_mel_matrix(
            num_mel_bins=64, num_spectrogram_bins=257,
            audio_sample_rate=16000,
            lower_edge_hertz=125, upper_edge_hertz=7500,
        )
        got = melspec.mel_matrix()
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)

    def test_periodic_hann_exact(self):
        from acav100m_tpu.ops import melspec

        mf, _ = vggish_ref()
        np.testing.assert_allclose(
            melspec.periodic_hann(400), mf.periodic_hann(400), rtol=0, atol=0
        )

    def test_framing_bit_exact(self):
        import jax.numpy as jnp

        from acav100m_tpu.ops import melspec

        mf, _ = vggish_ref()
        rng = np.random.RandomState(0)
        for n in (400, 560, 16000, 16123):
            x = rng.randint(-100, 100, size=n).astype(np.float32)
            want = mf.frame(x, 400, 160)
            got = np.asarray(melspec.frame_signal(jnp.asarray(x), 400, 160))
            np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("num_samples", [16000, 24000, 150000, 160000])
    def test_examples_match_reference_preprocess(self, num_samples):
        import jax.numpy as jnp

        from acav100m_tpu.ops import melspec

        _, pp = vggish_ref()
        rng = np.random.RandomState(num_samples)
        wav = rng.randn(num_samples).astype(np.float64) * 0.1
        want = pp._preprocess(wav, 16000).detach().numpy()[:, 0]  # (N,96,64)
        got = np.asarray(melspec.vggish_examples(jnp.asarray(wav, jnp.float32)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# -- learning-rate policy -----------------------------------------------------

class TestLrPolicyParity:
    def _ref(self):
        return ro.import_stage("evaluation", ["utils.lr_policy"])[
            "utils.lr_policy"
        ]

    @pytest.mark.parametrize("policy", ["linear", "cosine", "constant"])
    @pytest.mark.parametrize("total,warmup", [(40, 0), (40, 8), (173, 31)])
    def test_full_sweep(self, policy, total, warmup):
        from acav100m_tpu.evaluation.train import lr_schedule

        ref = self._ref()
        base_lr, ws = 0.1, 0.004
        sched = lr_schedule(policy, base_lr, total, warmup_steps=warmup,
                            warmup_start_lr=ws)
        for step in range(total + 1):
            want = ref.get_lr(policy, base_lr, ws, step, total, warmup)
            got = float(sched(step))
            # optax evaluates in f32; near the cosine tail the absolute
            # values are ~1e-4 so f32 cos noise needs the abs term
            assert got == pytest.approx(want, rel=1e-4, abs=1e-7), (
                policy, step, got, want
            )


# -- shard placement ----------------------------------------------------------

class TestShardPlacementParity:
    def _dist(self):
        return ro.import_stage("feature_extraction", ["mps.distributed"])[
            "mps.distributed"
        ]

    def test_node_selection(self):
        from acav100m_tpu.utils import shards

        dmod = self._dist()
        for n in range(1, 11):
            urls = [f"shard-{i:06d}.tar" for i in range(n)]
            for total in range(1, 6):
                for index in range(total):
                    for is_train in (False, True):
                        want = dmod.node_selection(
                            list(urls), index=index, total=total,
                            is_train=is_train,
                        )
                        got = shards.node_selection(
                            urls, index, total, is_train=is_train
                        )
                        assert got == want, (n, index, total, is_train)

    def test_worker_urls(self):
        import torch.utils.data as tud

        from acav100m_tpu.utils import shards

        dmod = self._dist()
        orig = tud.get_worker_info
        try:
            for n in range(1, 9):
                urls = [f"s{i}" for i in range(n)]
                for nw in range(1, 5):
                    for wid in range(nw):
                        info = types.SimpleNamespace(id=wid, num_workers=nw)
                        tud.get_worker_info = lambda info=info: info
                        # the reference reads the function through the
                        # torch module at call time
                        assert dmod.worker_urls(list(urls)) == \
                               shards.worker_selection(urls, wid, nw)
        finally:
            tud.get_worker_info = orig

    def test_get_length(self):
        from acav100m_tpu.utils import shards

        dmod = self._dist()
        rng = random.Random(7)
        orig = dmod.get_world_size
        try:
            for _ in range(60):
                n = rng.randint(1, 12)
                sizes = [rng.randint(1, 900) for _ in range(n)]
                batch = rng.choice([1, 4, 32])
                nw = rng.randint(0, 6)
                total = rng.randint(1, 4)
                is_train = rng.random() < 0.5
                dmod.get_world_size = lambda total=total: total
                want = dmod.get_length(list(sizes), batch, nw, is_train=is_train)
                got = shards.get_length(sizes, batch, nw, total,
                                        is_train=is_train)
                assert got == want, (sizes, batch, nw, total, is_train)
        finally:
            dmod.get_world_size = orig


# -- spatial transforms -------------------------------------------------------

class TestTransformParity:
    def test_uniform_crop(self):
        """Reference data/transform.py::uniform_crop (the test-time
        NUM_SPATIAL_CROPS enumeration) vs uniform_crop_offsets. torchaudio
        is absent in-image and only used inside the (unexercised) log-mel
        helpers, so a bare module stub suffices."""
        import torch

        if "torchaudio" not in sys.modules:
            try:
                importlib.import_module("torchaudio")
            except ImportError:
                sys.modules["torchaudio"] = types.ModuleType("torchaudio")

        # loaded by file path: transform.py has no relative imports, and
        # going through the data package would pull ucf101/acav (PyAV,
        # vendored wds — absent/heavy)
        if "reftransform" in sys.modules:
            tmod = sys.modules["reftransform"]
        else:
            spec = importlib.util.spec_from_file_location(
                "reftransform",
                ro.REFERENCE / "evaluation" / "code" / "data" / "transform.py",
            )
            tmod = importlib.util.module_from_spec(spec)
            sys.modules["reftransform"] = tmod
            spec.loader.exec_module(tmod)
        from acav100m_tpu.evaluation.data import uniform_crop_offsets

        rng = np.random.RandomState(0)
        for h, w in [(128, 171), (171, 128), (112, 112), (130, 120),
                     (120, 130), (113, 200)]:
            images = rng.randint(0, 255, size=(4, 3, h, w)).astype(np.float32)
            for size in (112, min(h, w)):
                for spatial_idx in (0, 1, 2):
                    want = tmod.uniform_crop(
                        torch.tensor(images), size, spatial_idx
                    ).numpy()
                    y, x = uniform_crop_offsets(h, w, size, spatial_idx)
                    got = images[:, :, y:y + size, x:x + size]
                    np.testing.assert_array_equal(got, want, err_msg=str(
                        (h, w, size, spatial_idx)
                    ))


# -- stage-5 buffered shuffle -------------------------------------------------

class TestBufferShuffleParity:
    @pytest.mark.parametrize("n,bufsize,initial", [
        (500, 64, 100), (500, 1000, 100), (50, 8, 4), (1000, 128, 128),
        (3, 16, 100),
    ])
    def test_trajectory_identical(self, n, bufsize, initial):
        """The reference vendors webdataset's buffered shuffle for the
        stage-5 training stream; batch order feeds the k-means trajectory,
        so buffered_shuffle reproduces it element-for-element under a
        shared rng (same Random instance state on both sides)."""
        from acav100m_tpu.pipeline.clustering import buffered_shuffle

        smod = ro.import_stage("clustering", ["data.shuffle"])["data.shuffle"]

        want = list(smod.shuffle_(
            iter(range(n)), bufsize=bufsize, initial=initial,
            rng=random.Random(7),
        ))
        got = list(buffered_shuffle(
            range(n), bufsize, random.Random(7), initial=initial,
        ))
        assert got == want
        assert sorted(got) == list(range(n))  # a permutation, nothing lost


# -- stage-4 output schema ----------------------------------------------------

class TestOutputSchemaParity:
    def test_save_output_rows_equal_and_cross_readable(self, tmp_path):
        """The reference's own ``save.py::_save_output`` writes a feature
        pkl from synthetic per-model data; the repo writes the same rows
        via make_feature_row/save_shard_output. Loaded rows must be
        content-equal (dict key order differs, which pickle preserves but
        readers never depend on), and the repo's stage-5 row parser must
        consume the REFERENCE-written pkl unchanged — the mutual-
        resumability claim, executed."""
        from acav100m_tpu.pipeline.clustering import (
            clustering_types_from_row,
            row_features,
        )
        from acav100m_tpu.utils.io import (
            load_pickle,
            make_feature_row,
            save_shard_output,
        )

        save = ro.import_stage("feature_extraction", ["save"])["save"]

        shard = "shard-000000"
        rng = np.random.RandomState(0)
        vdims = [88, 352, 704, 1408, 2304]
        adims = [64, 128, 256, 512, 128]
        clips = [f"clip{i}.mp4" for i in range(3)]

        def point(dims, fname):
            return {
                "features": [rng.randn(d).astype(np.float32) for d in dims],
                "filename": fname, "shard_size": 3, "shard_name": shard,
            }

        data = [
            {"model_key": "layer_slow_fast", "name": "SLOWFAST_8x8_R50",
             "dataset": "kinetics-400",
             "data": {i: point(vdims, c) for i, c in enumerate(clips)}},
            {"model_key": "layer_vggish", "name": "VGGish",
             "dataset": "YouTube-8M",
             "data": {i: point(adims, c) for i, c in enumerate(clips)}},
        ]

        args = types.SimpleNamespace(
            model_types=types.SimpleNamespace(audio=["layer_vggish"]),
            data=types.SimpleNamespace(
                output=types.SimpleNamespace(path=tmp_path / "ref")
            ),
        )
        ref_path = save._save_output(args, shard, list(range(3)), data)
        ref_rows = load_pickle(ref_path)

        repo_rows = [
            make_feature_row(
                clips[i], shard, 3,
                per_model=[
                    {"model_key": m["model_key"],
                     "extractor_name": m["name"], "dataset": m["dataset"],
                     "array": m["data"][i]["features"]}
                    for m in data
                ],
                audio_model_keys=["layer_vggish"],
            )
            for i in range(3)
        ]
        repo_path = save_shard_output(repo_rows, tmp_path / "repo", shard)
        got_rows = load_pickle(repo_path)

        assert len(got_rows) == len(ref_rows) == 3
        for got, ref in zip(got_rows, ref_rows):
            assert set(got) == set(ref)
            for key in ("filename", "shard_name", "shard_size"):
                assert got[key] == ref[key]
            for side in ("video_features", "audio_features"):
                assert len(got[side]) == len(ref[side])
                for g, r in zip(got[side], ref[side]):
                    assert set(g) == set(r)
                    for key in ("model_key", "extractor_name", "dataset"):
                        assert g[key] == r[key]
                    assert set(g["array"]) == set(r["array"])
                    for layer in r["array"]:
                        np.testing.assert_array_equal(
                            g["array"][layer], r["array"][layer]
                        )

        # cross-readability: the repo's stage-5 parser on REFERENCE rows
        ref_types = clustering_types_from_row(ref_rows[0])
        assert ref_types == clustering_types_from_row(got_rows[0])
        for ref_row, got_row in zip(ref_rows, got_rows):
            for a, b in zip(row_features(ref_row, ref_types),
                            row_features(got_row, ref_types)):
                np.testing.assert_array_equal(a, b)


# -- stage-6 contrastive post-sampling (coreutils pipeline) -------------------

class TestMergeContrastiveParity:
    def test_sort_dedupe_chain(self, tmp_path):
        """The reference's merge_contrastive.py post-processing is a shell
        pipeline (cat -> `sort -t , -u -k 1,1gr -k 2` -> awk score-strip ->
        awk '!visited[$0]++'); coreutils exist in-image so the ACTUAL
        pipeline runs as the oracle for merge_contrastive_csvs. Covers
        score-descending order, the filename-ascending tie-break, exact
        duplicate-row collapse, and first-wins dedupe. Filenames are
        globally unique (one shard per filename) — the repo dedupes by
        filename where the reference dedupes whole lines, which only
        differs when one filename legitimately spans shards."""
        from acav100m_tpu.pipeline.contrastive_selection import (
            merge_contrastive_csvs,
        )

        mc = ro.import_stage("subset_selection", ["merge_contrastive"])[
            "merge_contrastive"
        ]

        rng = np.random.RandomState(0)
        n = 60
        scores = np.round(rng.rand(n), 2)  # 2 decimals -> real ties
        rows = [
            (f"shard-{i % 4:06d}", f"vid{i:04d}", float(scores[i]))
            for i in range(n)
        ]
        rows += rows[:7]  # exact duplicate rows

        # reference-format caches (score,filename,shard) + repo-format
        # caches (shard,filename,score), same 3-way split
        (tmp_path / "caches").mkdir()
        ref_paths, repo_paths = [], []
        for ci, chunk in enumerate([rows[0::3], rows[1::3], rows[2::3]]):
            rp = tmp_path / f"refcache_{ci}.csv"
            rp.write_text("".join(
                f"{s:.2f},{f},{sh}\n" for sh, f, s in chunk
            ))
            ref_paths.append(rp)
            op = tmp_path / f"repocache_{ci}.csv"
            op.write_text("".join(
                f"{sh},{f},{s:.2f}\n" for sh, f, s in chunk
            ))
            repo_paths.append(op)

        out_path = tmp_path / "output.csv"
        mc.merge_csvs(ref_paths, out_path, "merged")
        mc.sort_csv(out_path, "merged", "sorted")
        mc.remove_scores(out_path, "sorted", "scoreless")
        final = mc.remove_duplicates(out_path, "scoreless", "unique")
        want = [
            tuple(line.split(","))  # (filename, shard)
            for line in Path(final).read_text().splitlines()
        ]

        got_path, count = merge_contrastive_csvs(
            repo_paths, tmp_path / "repo_out.csv", subset_ratio=1.0,
        )
        got = [
            (f, sh)
            for sh, f, _ in (
                line.split(",")
                for line in Path(got_path).read_text().splitlines()
            )
        ]
        assert count == len(want)
        assert got == want


# -- test-meter ensembling ----------------------------------------------------

class TestMeterParity:
    def test_meter_ensembling(self):
        """ClassifyTestMeter's multi-view ensemble + topks_correct executed
        as the oracle for accumulate_ensemble/ensemble_topk (the math of
        linear_eval's test pass). fvcore is absent in-image; its Timer is
        the only symbol meters.py touches, so it is stubbed."""
        import torch

        from acav100m_tpu.evaluation.train import (
            accumulate_ensemble,
            ensemble_topk,
        )

        if "fvcore" not in sys.modules:
            try:
                importlib.import_module("fvcore")
            except ImportError:
                fv = types.ModuleType("fvcore")
                common = types.ModuleType("fvcore.common")
                timer = types.ModuleType("fvcore.common.timer")

                class Timer:
                    def reset(self):
                        pass

                    def pause(self):
                        pass

                    def seconds(self):
                        return 0.0

                timer.Timer = Timer
                fv.common = common
                common.timer = timer
                sys.modules["fvcore"] = fv
                sys.modules["fvcore.common"] = common
                sys.modules["fvcore.common.timer"] = timer

        mods = ro.import_stage("evaluation", ["utils.meters", "utils.metrics"])
        meters, metrics = mods["utils.meters"], mods["utils.metrics"]

        rng = np.random.RandomState(0)
        n_videos, n_clips, n_cls = 30, 6, 11
        # softmax-like nonnegative scores: the reference's "max" ensemble
        # maxes against a zero-initialized buffer (meters.py:561,603),
        # which only equals a true running max for nonnegative scores
        logits = rng.rand(n_videos * n_clips, n_cls)
        labels = rng.randint(0, n_cls, size=n_videos)

        for method in ("sum", "max"):
            meter = meters.ClassifyTestMeter(
                n_videos, n_clips, n_cls, overall_iters=1,
                ensemble_method=method, log_period=10**9,
            )
            scores: dict = {}
            labels_by_video: dict = {}
            order = rng.permutation(n_videos * n_clips)
            for start in range(0, len(order), 7):  # ragged batches
                idx = order[start:start + 7]
                batch_logits = logits[idx]
                batch_videos = idx // n_clips
                meter.update_stats(
                    torch.tensor(batch_logits),
                    torch.tensor(labels[batch_videos]),
                    torch.tensor(idx),
                )
                accumulate_ensemble(scores, batch_logits, batch_videos,
                                    method=method)
                for v in batch_videos:
                    labels_by_video[int(v)] = int(labels[v])

            got = ensemble_topk(scores, labels_by_video, ks=(1, 5))
            # compat patch (same spirit as reference_oracle.patch_cuda):
            # metrics.py:37 calls .view(-1) on a non-contiguous transposed
            # slice, which this image's torch 2.13 rejects — fall back to
            # reshape for the duration of the oracle call
            orig_view = torch.Tensor.view

            def view_or_reshape(self, *shape):
                try:
                    return orig_view(self, *shape)
                except RuntimeError:
                    return self.reshape(*shape)

            torch.Tensor.view = view_or_reshape
            try:
                correct = metrics.topks_correct(
                    meter.point_preds, meter.point_labels, (1, 5)
                )
            finally:
                torch.Tensor.view = orig_view
            want = {
                k: float(c) / n_videos * 100.0
                for k, c in zip((1, 5), correct)
            }
            assert got[1] == pytest.approx(want[1], abs=1e-9), method
            assert got[5] == pytest.approx(want[5], abs=1e-9), method
            # the ensembled score tables themselves agree
            stacked = np.stack([scores[v] for v in range(n_videos)])
            np.testing.assert_allclose(
                stacked, meter.point_preds.numpy(), rtol=1e-6, atol=1e-9
            )

"""Unified CLI for every pipeline stage.

The reference shipped a separate fire-based ``cli.py`` per stage
(``feature_extraction/code/cli.py:37`` etc.); here one argparse entry point
covers the whole pipeline with the same dotted-key override style:

    python -m acav100m_tpu filter in.tsv out.tsv [--keywords_dir=...]
    python -m acav100m_tpu download filtered.tsv out_dir [--source_dir=...]
    python -m acav100m_tpu segment video_dir out_dir [key=val ...]
    python -m acav100m_tpu extract data.media.path=... data.output.path=...
    python -m acav100m_tpu cluster data.path=... data.output.path=...
    python -m acav100m_tpu select data.path=... data.output.path=...
    python -m acav100m_tpu reduce out.csv cache1.csv cache2.csv ...
    python -m acav100m_tpu retrieval [key=val ...]
    python -m acav100m_tpu bench
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

from .config import parse_overrides

if os.environ.get("JAX_PLATFORMS"):
    # honor the env var even under TPU platform plugins that overwrite it
    # at import time (the tunneled 'axon' plugin does): re-assert the
    # user's choice through the config API before backend init.
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _overrides(tokens):
    return parse_overrides([t for t in tokens if "=" in t])


def cmd_filter(args):
    from .pipeline.metadata_filtering import run_file

    kept, total = run_file(
        args.in_path, args.out_path,
        keywords_dir=args.keywords_dir, fasttext_model=args.fasttext_model,
    )
    pct = 100.0 * kept / max(total, 1)
    print(f"Done. {kept}/{total}({pct:.2f}%) lines left")


def cmd_download(args):
    from .pipeline.video_download import run_download

    ok, total = run_download(args.tsv_path, args.out_dir, source_dir=args.source_dir)
    print(f"downloaded {ok}/{total}")


def cmd_segment(args):
    import random

    from .pipeline.clip_segmentation import (
        DEFAULT_SEED,
        open_video_backend,
        segment_video,
    )

    rng = random.Random(args.seed)
    video_dir = Path(args.video_dir)
    count = 0
    for path in sorted(video_dir.glob("*.mp4")):
        backend = open_video_backend(path, getattr(args, "backend", "auto"))
        clips, paths = segment_video(
            backend, args.out_dir, path.stem,
            num_clips=args.num_clips, sampling=args.sampling,
            cut_random_clips=getattr(args, "cut_random_clips", None),
            calc_diversity_with_sum=getattr(
                args, "calc_diversity_with_sum", False),
            rng=rng,
        )
        count += len(paths)
    print(f"extracted {count} clips to {args.out_dir}")


def cmd_extract(args):
    from .pipeline.feature_extraction import get_config, run_extraction

    cfg = get_config(_overrides(args.overrides))
    saved = run_extraction(cfg)
    print(f"saved {len(saved)} feature shards")


def cmd_cluster(args):
    from .pipeline.clustering import get_config, run_clustering

    cfg = get_config(_overrides(args.overrides))
    saved = run_clustering(cfg)
    print(f"saved {len(saved)} assignment shards")


def cmd_select(args):
    from .pipeline.subset_selection import get_config, run

    cfg = get_config(_overrides(args.overrides))
    out_path, count = run(cfg)
    print(f"Saved Results: added {count} lines to {out_path}")


def cmd_reduce(args):
    from .utils.io import merge_csvs

    count = merge_csvs(args.caches, args.out_path)
    print(f"merged {count} lines into {args.out_path}")


def cmd_retrieval(args):
    import json as _json

    from .retrieval.runner import run_experiment

    kwargs = {}
    for key, val in _overrides(args.overrides).items():
        if isinstance(val, str):  # literal coercion: 0.5 -> float, 3 -> int
            try:
                val = _json.loads(val)
            except (ValueError, TypeError):
                pass
        kwargs[key] = val
    if args.dataset != "gaussian":
        # real-data protocols (reference image_pair_data.py): synthetic
        # pre-materialized digits stand in for the gated MNIST/CIFAR/FSDD
        # downloads; loaders accept any (N,H,W[,3]) arrays
        from .retrieval import features as rf

        nclasses = int(kwargs.pop("nclasses", 6))
        images, labels = rf.synthetic_digits(
            nclasses=nclasses,
            per_class=int(kwargs.pop("per_class", 12)),
        )
        if args.dataset == "resnet_pairs":
            views = rf.resnet_pair_views(
                images, labels, transform=kwargs.pop("transform", "rotate"))
        elif args.dataset == "mnist_sound":
            views = rf.mnist_sound_pair_views(images, labels)
            kwargs.setdefault("pairing", "bipartite")
        else:
            raise SystemExit(f"unknown dataset {args.dataset!r}")
        kwargs["views"] = views
        kwargs.setdefault("ncentroids", nclasses)
        kwargs.setdefault("clustering_method", "sklearn")
    if args.grid:
        # option-grid mode (reference grid_search.py over
        # search_targets/**/*.json); results pickled per config
        from .retrieval.runner import grid_search, load_option_grid

        jobs = load_option_grid(args.grid)
        for job in jobs:
            for k, v in kwargs.items():
                if k != "views":
                    job.setdefault(k, v)
        results = grid_search(
            job_kwargs=jobs, out_dir=args.out_path,
            views=kwargs.get("views"),
        )
        for res in results:
            print(
                f"{res['config']}: precision={res['precision']:.4f} "
                f"recall={res['recall']:.4f} f1={res['f1']:.4f}"
            )
        return
    res = run_experiment(out_path=args.out_path, **kwargs)
    print(
        f"precision={res['precision']:.4f} recall={res['recall']:.4f} "
        f"f1={res['f1']:.4f}"
    )


def cmd_fixtures(args):
    """Generate synthetic clip shards (+ optional downstream labels.json)
    — the runnable stand-in for the reference's unshipped samples_tiny."""
    import json as _json

    import numpy as np

    import io as _io
    import tarfile as _tarfile

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    count = 0
    for si in range(args.num_shards):
        meta = []
        with _tarfile.open(out / f"shard-{si:06d}.tar", "w") as tf:
            for ci in range(args.clips_per_shard):
                t = np.arange(int(16000 * 10.0)) / 16000.0
                klass = count % 4
                frames = rng.randint(0, 60, (32, args.size, args.size, 3)).astype(np.uint8)
                frames[..., klass % 3] += np.uint8(120)
                audio = (0.4 * np.sin(2 * np.pi * 220.0 * (1 + klass) * t)
                         + 0.05 * rng.randn(len(t))).astype(np.float32)
                buf = _io.BytesIO()
                np.savez(buf, frames=frames, audio=audio, sample_rate=16000,
                         video_fps=3.2)
                data = buf.getvalue()
                fname = f"clip_{si:03d}_{ci:03d}.npz"
                info = _tarfile.TarInfo(fname)
                info.size = len(data)
                tf.addfile(info, _io.BytesIO(data))
                meta.append({"filename": fname, "id": f"vid{count:06d}",
                             "segment": [float(ci), float(ci) + 10.0]})
                count += 1
        (out / f"shard-{si:06d}.json").write_text(_json.dumps(meta))
    if args.labels:
        # flat ClipClassificationDataset next to the shards (npz clips +
        # labels.json), for driving the linear_eval task
        cls_dir = out / "classify"
        cls_dir.mkdir(exist_ok=True)
        items = []
        n = args.num_shards * args.clips_per_shard
        for i in range(n):
            klass = i % 4
            t = np.arange(int(16000 * 2.0)) / 16000.0
            frames = rng.randint(0, 60, (12, args.size, args.size, 3)).astype(np.uint8)
            frames[..., klass % 3] += np.uint8(120)
            audio = (0.4 * np.sin(2 * np.pi * 220.0 * (1 + klass) * t)
                     + 0.05 * rng.randn(len(t))).astype(np.float32)
            fname = f"clip{i:04d}.npz"
            np.savez(cls_dir / fname, frames=frames, audio=audio,
                     sample_rate=16000, video_fps=6.0)
            items.append({"file": fname, "label": klass,
                          "split": "train" if i < max(n - 4, n // 2) else "test"})
        (cls_dir / "labels.json").write_text(_json.dumps(
            {"classes": [f"c{k}" for k in range(4)], "items": items}))
    print(f"wrote {args.num_shards} shards ({count} clips) to {out}")


def cmd_evaluate(args):
    """Evaluation tasks from a YAML/JSON config (the reference's fvcore
    CfgNode + per-dataset YAML surface, evaluation/code/config.py:24-560)."""
    import json as _json

    from .evaluation.config import load_config, run_task

    cfg = load_config(args.cfg, _overrides(args.overrides))
    result = run_task(cfg)
    result.pop("history", None)
    print(_json.dumps(result, default=float))


def cmd_convert(args):
    """torch/caffe2 checkpoint -> flax .npz + sha256 manifest
    (reference weight path: utils_slowfast/load_model.py:24-69)."""
    from .models.zoo import convert_checkpoint

    manifest = convert_checkpoint(args.model, args.in_path, args.out_path,
                                  fmt=args.format)
    import json as _json

    print(_json.dumps(manifest, indent=1))


def cmd_zoo(args):
    """Fetch checkpoint URLs / weights (egress-gated; prints instructions
    when offline)."""
    from .models.zoo import fetch_weights, get_model_zoo

    cache_dir = Path(args.cache_dir).expanduser()
    if args.fetch:
        path = fetch_weights(args.fetch, cache_dir)
        print(path)
    else:
        choices = get_model_zoo(cache_dir)
        for config, url in sorted(choices.items()):
            print(f"{config}\t{url}")


def cmd_bench(args):
    import runpy

    runpy.run_path(str(Path(__file__).resolve().parent.parent / "bench.py"),
                   run_name="__main__")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="acav100m_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("filter", help="stage 1: metadata filtering")
    p.add_argument("in_path")
    p.add_argument("out_path")
    p.add_argument("--keywords_dir", default=None)
    p.add_argument("--fasttext_model", default=None)
    p.set_defaults(fn=cmd_filter)

    p = sub.add_parser("download", help="stage 2: video download")
    p.add_argument("tsv_path")
    p.add_argument("out_dir")
    p.add_argument("--source_dir", default=None)
    p.set_defaults(fn=cmd_download)

    p = sub.add_parser("segment", help="stage 3: clip segmentation")
    p.add_argument("video_dir")
    p.add_argument("out_dir")
    p.add_argument("--num_clips", type=int, default=3)
    p.add_argument("--sampling", default="diversity_greedy")
    p.add_argument("--cut_random_clips", type=int, default=None)
    p.add_argument("--calc_diversity_with_sum", action="store_true")
    p.add_argument("--seed", type=int, default=98052)
    p.add_argument("--backend", default="auto",
                   choices=["auto", "native", "ffmpeg", "opencv"])
    p.set_defaults(fn=cmd_segment)

    for verb, fn, help_ in (
        ("extract", cmd_extract, "stage 4: feature extraction"),
        ("cluster", cmd_cluster, "stage 5: k-means clustering"),
        ("select", cmd_select, "stage 6: MI subset selection"),
        ("retrieval", cmd_retrieval, "correspondence-retrieval experiment"),
    ):
        p = sub.add_parser(verb, help=help_)
        p.add_argument("overrides", nargs="*", help="dotted key=value overrides")
        if verb == "retrieval":
            p.add_argument("--out_path", default=None)
            p.add_argument("--dataset", default="gaussian",
                           choices=["gaussian", "resnet_pairs", "mnist_sound"])
            p.add_argument("--grid", default=None,
                           help="option-grid json (reference "
                                "search_targets format or {kwarg: [values]})")
        p.set_defaults(fn=fn)

    p = sub.add_parser("reduce", help="merge chunk cache csvs")
    p.add_argument("out_path")
    p.add_argument("caches", nargs="+")
    p.set_defaults(fn=cmd_reduce)

    p = sub.add_parser("fixtures", help="generate synthetic clip shards")
    p.add_argument("out_dir")
    p.add_argument("--num_shards", type=int, default=2)
    p.add_argument("--clips_per_shard", type=int, default=4)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--labels", action="store_true",
                   help="also write a classify/ ClipClassificationDataset")
    p.set_defaults(fn=cmd_fixtures)

    p = sub.add_parser("evaluate", help="evaluation tasks (pretrain / linear_eval)")
    p.add_argument("--cfg", default=None, help="YAML/JSON config file")
    p.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("convert", help="convert a torch/caffe2 checkpoint to flax npz")
    p.add_argument("model", choices=["slowfast", "vggish"])
    p.add_argument("in_path")
    p.add_argument("out_path")
    p.add_argument("--format", default=None,
                   choices=[None, "pyslowfast", "caffe2", "vggish"])
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("zoo", help="list/fetch model-zoo checkpoints (needs egress)")
    p.add_argument("--cache_dir", default="~/.cache/acav100m_tpu")
    p.add_argument("--fetch", default=None,
                   help="config name (e.g. Kinetics/c2/SLOWFAST_8x8_R50) or 'vggish'")
    p.set_defaults(fn=cmd_zoo)

    p = sub.add_parser("bench", help="run the throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()

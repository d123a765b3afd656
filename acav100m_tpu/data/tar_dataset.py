"""Streaming tar shard dataset + batched device feed.

Replaces the reference's WebDataset stack (``MetaWebDataset``
``feature_extraction/code/data/metawebdataset.py``, pipeline
``data/webdataset.py:39-123``, loader/collate ``data/loader.py``) with a
dependency-free host pipeline:

* stream tar members shard by shard, join shard metadata, honor per-shard
  skip lists (resume);
* decode + prepare each clip (errors skip-and-continue, the reference's
  ``warn_and_continue`` behavior);
* assemble static-shape batches (pad the tail batch and mask) and
  double-buffer them onto the device with a background prefetch thread —
  the host-side equivalent of keeping the MXU fed.
"""

from __future__ import annotations

import queue
import tarfile
import threading
import warnings
from pathlib import Path
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from .video import decode_npz, prepare_clip


class TarShardDataset:
    """Iterates {filename, shard_name, shard_size, **clip arrays}."""

    def __init__(
        self,
        shard_paths: Sequence,
        metas: Dict[str, Dict[str, Dict]],
        skip_lists: Optional[Dict[str, List[str]]] = None,
        decoder: Callable[[bytes], Optional[Dict]] = decode_npz,
        prepare: Callable[[Optional[Dict]], Optional[Dict]] = prepare_clip,
        on_error: str = "continue",
    ):
        self.shard_paths = [Path(p) for p in shard_paths]
        self.metas = metas
        self.skip_lists = skip_lists or {}
        self.decoder = decoder
        self.prepare = prepare
        self.on_error = on_error

    def _iter_members(self, shard_path):
        """(filename, bytes) pairs; native header-walk indexer when the
        compiled ``libtario`` is available, else Python tarfile."""
        from . import native_tar

        index = native_tar.index_tar(shard_path) if native_tar.available() else None
        if index is not None:
            for name, offset, size in index:
                data = native_tar.read_member(shard_path, offset, size)
                if data is not None:
                    yield name, data
            return
        with tarfile.open(shard_path) as tf:
            for member in tf.getmembers():
                if member.isfile():
                    yield member.name, tf.extractfile(member).read()

    def __iter__(self) -> Iterator[Dict]:
        for shard_path in self.shard_paths:
            shard_name = shard_path.stem
            meta = self.metas.get(shard_name, {})
            shard_size = len(meta)
            skip = set(self.skip_lists.get(shard_name, []))
            try:
                members = self._iter_members(shard_path)
                for member_name, data in members:
                    fname = Path(member_name).name
                    stem = Path(member_name).stem
                    if stem not in meta or fname in skip:
                        continue
                    try:
                        clip = self.prepare(self.decoder(data))
                    except Exception as e:
                        if self.on_error == "raise":
                            raise
                        warnings.warn(f"decode failed for {fname}: {e}")
                        continue
                    if clip is None:
                        continue
                    yield {
                        "filename": fname,
                        "shard_name": shard_name,
                        "shard_size": shard_size,
                        **clip,
                    }
            except Exception as e:  # skip-and-continue per shard
                if self.on_error == "raise":
                    raise
                warnings.warn(f"failed to read shard {shard_path}: {e}")
                continue


def collate(samples: List[Dict], batch_size: int) -> Dict:
    """Stack a (possibly short) list of samples into a padded batch.

    Static shapes: the batch is padded to ``batch_size`` by repeating the
    first sample; ``batch_mask`` marks real rows. The reference instead
    fell back to per-sample loops on ragged batches
    (``process_batch.py:10-24``) — masking keeps one compiled program.
    """
    n = len(samples)
    assert 0 < n <= batch_size
    pad = batch_size - n
    batch = {
        "filename": [s["filename"] for s in samples] + [""] * pad,
        "shard_name": [s["shard_name"] for s in samples] + [""] * pad,
        "shard_size": [s["shard_size"] for s in samples] + [0] * pad,
        "batch_mask": np.asarray([True] * n + [False] * pad),
    }
    for key in ("frames", "audio", "valid_samples"):
        if key in samples[0]:
            arrs = [np.asarray(s[key]) for s in samples]
            arrs += [np.zeros_like(arrs[0])] * pad
            batch[key] = np.stack(arrs)
    return batch


def batched(source: Iterable[Dict], batch_size: int) -> Iterator[Dict]:
    buf: List[Dict] = []
    for sample in source:
        buf.append(sample)
        if len(buf) == batch_size:
            yield collate(buf, batch_size)
            buf = []
    if buf:
        yield collate(buf, batch_size)


class Prefetcher:
    """Background-thread prefetch of host batches (double buffering)."""

    _SENTINEL = object()

    def __init__(self, source: Iterable, depth: int = 2):
        self.queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self.error: Optional[BaseException] = None
        self.thread = threading.Thread(
            target=self._fill, args=(iter(source),), daemon=True
        )
        self.thread.start()

    def _fill(self, it):
        try:
            for item in it:
                self.queue.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self.error = e
        finally:
            self.queue.put(self._SENTINEL)

    def __iter__(self):
        while True:
            item = self.queue.get()
            if item is self._SENTINEL:
                if self.error is not None:
                    raise self.error
                return
            yield item


def _sample_to_shm(sample: Dict):
    """Move a decoded sample's arrays into a SharedMemory segment; return a
    small picklable descriptor.

    Kill-safety is the point: a worker hard-killed (OOM killer, os._exit)
    mid-write can tear a multi-MB pickled sample in the mp.Queue pipe and
    the consumer's recv then blocks FOREVER on the missing bytes. Pipe
    writes up to PIPE_BUF (64 KB on Linux) are atomic, so the queue carries
    only this sub-KB descriptor; the ~6 MB of frames/audio ride shared
    memory. (Also one fewer pickle copy per sample on the hot host path.)
    """
    from multiprocessing import shared_memory

    arrays = {k: np.asarray(v) for k, v in sample.items()
              if isinstance(v, np.ndarray) or k in ("frames", "audio", "valid_samples")}
    total = sum(int(a.nbytes) for a in arrays.values())
    meta = {k: v for k, v in sample.items() if k not in arrays}
    if total == 0:
        return {"meta": meta, "shm": None, "layout": []}
    shm = shared_memory.SharedMemory(create=True, size=total)
    layout = []
    offset = 0
    for key, arr in arrays.items():
        view = np.ndarray(arr.shape, arr.dtype, buffer=shm.buf, offset=offset)
        view[...] = arr
        layout.append((key, str(arr.dtype), arr.shape, offset))
        offset += int(arr.nbytes)
    name = shm.name
    shm.close()
    return {"meta": meta, "shm": name, "layout": layout}


def _sample_from_shm(payload: Dict) -> Dict:
    """Rebuild a sample from its descriptor; copies out and unlinks."""
    from multiprocessing import shared_memory

    sample = dict(payload["meta"])
    if payload["shm"] is None:
        return sample
    shm = shared_memory.SharedMemory(name=payload["shm"])
    try:
        for key, dtype, shape, offset in payload["layout"]:
            view = np.ndarray(shape, np.dtype(dtype), buffer=shm.buf, offset=offset)
            sample[key] = np.array(view)  # own the memory past unlink
    finally:
        shm.close()
        shm.unlink()
    return sample


def _stream_worker(wid, shard_paths, metas, skip_lists, decoder, prepare, q):
    """Persistent decode worker: streams its shard subset sample-by-sample
    onto the shared bounded queue (runs in a *spawned* process — fork under
    a live JAX runtime deadlocks; the reference instead relied on torch
    DataLoader workers, ``mps/distributed.py worker_urls``). Emits
    ``shard_done`` after each completed shard so the consumer can requeue
    only the unfinished remainder on failure. Bulk array data travels via
    shared memory (see ``_sample_to_shm``) so queue messages stay within
    the pipe's atomic-write bound — a killed worker can never corrupt the
    stream for everyone else."""
    try:
        for shard_path in shard_paths:
            ds = TarShardDataset([shard_path], metas, skip_lists, decoder, prepare)
            for sample in ds:
                q.put(("sample", _sample_to_shm(sample)))
            q.put(("shard_done", (wid, Path(shard_path).stem)))
    except Exception as e:  # surfaced (not raised) on the consumer side
        q.put(("error", (wid, f"{type(e).__name__}: {e}")))
    finally:
        q.put(("done", wid))


def _pooled_stream(
    shard_paths: Sequence,
    metas: Dict,
    skip_lists: Optional[Dict],
    decoder: Callable,
    prepare: Callable,
    num_workers: int,
    buffer_samples: int,
    shard_retries: int = 2,
    poll_interval: float = 1.0,
) -> Iterator[Dict]:
    """Stream samples from ``num_workers`` persistent decode processes.

    Memory is bounded by the queue: at most ``buffer_samples`` decoded
    clips (~6.3 MB each at production shapes) are in flight, regardless of
    shard size. Sample order is unordered across workers, like the
    reference's ``imap_unordered`` DataLoader semantics.

    Failure handling (beyond the reference's warn-and-drop): when a worker
    errors — or dies without reporting, detected by liveness polling — its
    unfinished shards are REQUEUED onto a replacement worker, with the
    partially-streamed shard resumed exactly-once via a skip list of the
    filenames already delivered. A shard that kills ``shard_retries``
    workers in a row is dropped with a warning (poison-shard guard; the
    per-shard cache/resume layer still covers it on the next run).
    """
    import multiprocessing as mp
    import queue as queue_mod
    from collections import defaultdict

    from ..utils.shards import worker_selection

    ctx = mp.get_context("spawn")
    q = ctx.Queue(maxsize=max(buffer_samples, 1))
    workers: Dict[int, Dict] = {}
    yielded: Dict[str, set] = defaultdict(set)
    retry_counts: Dict[str, int] = defaultdict(int)
    next_wid = 0

    def launch(sub_paths):
        nonlocal next_wid
        wid = next_wid
        next_wid += 1
        skips = {
            name: list(set(skip_lists.get(name, []) if skip_lists else [])
                       | yielded[name])
            for name in {Path(p).stem for p in sub_paths}
        }
        p = ctx.Process(
            target=_stream_worker,
            args=(wid, list(sub_paths), metas, skips, decoder, prepare, q),
            daemon=True,
        )
        p.start()
        workers[wid] = {"proc": p, "shards": list(sub_paths),
                        "completed": set(), "done": False}

    def handle_failure(wid, reason):
        st = workers[wid]
        if st["done"]:
            return
        st["done"] = True
        unfinished = [
            p for p in st["shards"] if Path(p).stem not in st["completed"]
        ]
        requeue = []
        for p in unfinished:
            retry_counts[Path(p).stem] += 1
            if retry_counts[Path(p).stem] > shard_retries:
                warnings.warn(
                    f"shard {Path(p).stem} dropped after {shard_retries} "
                    f"failed decode workers (poison shard?)"
                )
            else:
                requeue.append(p)
        warnings.warn(
            f"decode worker {wid} failed ({reason}); requeuing "
            f"{len(requeue)} unfinished shard(s)"
        )
        if requeue:
            launch(requeue)

    for w in range(num_workers):
        launch(worker_selection(list(shard_paths), w, num_workers))

    try:
        while any(not st["done"] for st in workers.values()):
            try:
                kind, payload = q.get(timeout=poll_interval)
            except queue_mod.Empty:
                for wid, st in list(workers.items()):
                    if not st["done"] and not st["proc"].is_alive():
                        handle_failure(wid, "process died without reporting")
                continue
            if kind == "sample":
                sample = _sample_from_shm(payload)
                yielded[sample["shard_name"]].add(sample["filename"])
                yield sample
            elif kind == "shard_done":
                wid, shard_name = payload
                workers[wid]["completed"].add(shard_name)
            elif kind == "error":
                wid, msg = payload
                handle_failure(wid, msg)
            else:  # done
                workers[payload]["done"] = True
    finally:
        for st in workers.values():
            p = st["proc"]
            if p.is_alive():
                p.terminate()
            p.join(timeout=5)
        # best-effort: unlink shm segments of undelivered in-flight samples
        # (early consumer exit); segments of killed workers are reclaimed by
        # the multiprocessing resource tracker at process shutdown
        try:
            from multiprocessing import shared_memory

            while True:
                kind, payload = q.get_nowait()
                if kind == "sample" and payload.get("shm"):
                    try:
                        seg = shared_memory.SharedMemory(name=payload["shm"])
                        seg.close()
                        seg.unlink()
                    except FileNotFoundError:
                        pass
        except queue_mod.Empty:
            pass
        q.close()


def empty_batch_like(batch: Dict) -> Dict:
    """An all-masked batch with the same array shapes (a lock-step no-op)."""
    out = {}
    # snapshot: consumers stage extra keys into (copies of) loader batches
    # on other threads; never iterate a live dict a consumer might touch
    for key, val in list(batch.items()):
        if key == "batch_mask":
            out[key] = np.zeros_like(val)
        elif isinstance(val, np.ndarray):
            out[key] = np.zeros_like(val)
        elif isinstance(val, list):
            out[key] = ["" if isinstance(v, str) else 0 for v in val]
        else:
            out[key] = val
    return out


def empty_batch(batch_size: int, num_frames: int = 32, size: int = 256,
                audio_len: int = 160000) -> Dict:
    """An all-masked batch built from config shapes (for ranks whose local
    loader yields nothing but that must still step with the collective)."""
    return {
        "filename": [""] * batch_size,
        "shard_name": [""] * batch_size,
        "shard_size": [0] * batch_size,
        "batch_mask": np.zeros(batch_size, bool),
        "frames": np.zeros((batch_size, num_frames, size, size, 3), np.uint8),
        "audio": np.zeros((batch_size, audio_len), np.float32),
        "valid_samples": np.full((batch_size,), audio_len, np.int32),
    }


def pad_to_length(batches: Iterable[Dict], num_batches: int,
                  template: Optional[Dict] = None) -> Iterator[Dict]:
    """Yield ``batches``, then all-masked padding up to ``num_batches``.

    The lock-step half of the reference's ``ResizedDataset`` +
    ``get_length`` contract (``mps/distributed.py:444-461``): under a
    multi-host mesh every host must invoke the jitted step the same number
    of times or the program deadlocks; hosts whose shards run short step
    through masked no-op batches instead.
    """
    n = 0
    last = None
    for b in batches:
        last = b
        n += 1
        yield b
    pad = empty_batch_like(last) if last is not None else template
    while n < num_batches:
        if pad is None:
            raise ValueError(
                "pad_to_length needs a template batch when the local loader "
                "is empty"
            )
        yield pad
        n += 1


def make_loader(
    shard_paths: Sequence,
    metas: Dict,
    batch_size: int,
    skip_lists: Optional[Dict] = None,
    decoder: Callable = decode_npz,
    prepare: Callable = prepare_clip,
    prefetch: int = 2,
    num_workers: int = 0,
    buffer_samples: int = 32,
    pad_to_batches: Optional[int] = None,
    pad_template: Optional[Dict] = None,
) -> Iterable[Dict]:
    """Batched clip loader.

    ``num_workers > 0`` decodes shards in persistent spawned worker
    processes that stream samples through a bounded queue (shards split
    round-robin across workers as in the reference's ``worker_urls``);
    TPU-VM hosts have many cores and decode is the system bottleneck
    (SURVEY.md section 7 "hard parts"). ``0`` keeps everything in-process
    with a background prefetch thread. ``buffer_samples`` caps in-flight
    decoded clips so loader memory stays bounded on large shards.
    """
    if num_workers > 0 and len(shard_paths) > 1:
        num_workers = min(num_workers, len(shard_paths))
        source = _pooled_stream(
            shard_paths, metas, skip_lists, decoder, prepare,
            num_workers, buffer_samples,
        )
        batches = batched(source, batch_size)
    else:
        ds = TarShardDataset(shard_paths, metas, skip_lists, decoder, prepare)
        batches = batched(ds, batch_size)
    if pad_to_batches is not None:
        batches = pad_to_length(batches, pad_to_batches, pad_template)
    if prefetch:
        return Prefetcher(batches, depth=prefetch)
    return batches

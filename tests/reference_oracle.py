"""Import machinery for running the REFERENCE's own code as a parity oracle.

The upstream repo at ``/root/reference`` is pure torch/numpy Python; its
subset-selection measures (``subset_selection/code/measures/``) and SGD
k-means (``clustering/code/sgd_clustering.py``) execute on CPU torch in this
image given three small dependency shims:

* ``torch_scatter.scatter_add`` -> ``Tensor.index_add_`` (the reference only
  uses the two scatter_add call shapes in ``sgd_clustering.py:113,123``);
* ``diffdist`` -> empty stub (imported, never called, by
  ``mps/distributed.py:16`` which ``sgd_clustering.py:7`` pulls in);
* ``braceexpand`` -> re-export of the repo's own implementation (used by
  ``subset_selection/code/dataloader.py:10``).

plus one runtime patch: ``sgd_clustering.py:113`` hard-calls ``.cuda()`` on
the scatter result, so :func:`patch_cuda` turns ``Tensor.cuda`` into a no-op
for the duration of a test (CPU-only torch build).

Each pipeline stage's ``code/`` dir is a flat module namespace with
colliding names (``utils``, ``config``, ``save`` ...), so stages are
imported in isolation: sys.path is pushed, the imported module objects are
stashed and then *removed* from ``sys.modules`` so a later stage (or the
repo's own test imports) never sees them.

This module only IMPORTS reference code — nothing here copies it.
"""

from __future__ import annotations

import contextlib
import importlib
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def has_reference() -> bool:
    return (REFERENCE / "subset_selection" / "code").is_dir()


# -- dependency shims ---------------------------------------------------------

def _make_torch_scatter_shim():
    import torch

    mod = types.ModuleType("torch_scatter")

    def scatter_add(src=None, index=None, out=None, dim=0, dim_size=None):
        if out is None:
            size = list(src.shape)
            size[dim] = int(dim_size) if dim_size is not None else int(index.max()) + 1
            out = torch.zeros(size, dtype=src.dtype, device=src.device)
            inplace = False
        else:
            inplace = True
        index = index.to(torch.long)
        out.index_add_(dim, index, src)
        return out if not inplace else out

    mod.scatter_add = scatter_add
    return mod


def _make_diffdist_shim():
    pkg = types.ModuleType("diffdist")
    functional = types.ModuleType("diffdist.functional")
    pkg.functional = functional
    return pkg, functional


def _make_braceexpand_shim():
    from acav100m_tpu.utils.braceexpand import braceexpand

    mod = types.ModuleType("braceexpand")
    mod.braceexpand = braceexpand
    return mod


def _make_webdataset_shim():
    """The webdataset surfaces the stage-4/5 drivers touch.

    ``ResizedDataset`` is a faithful reimplementation of the version the
    reference itself vendors (``evaluation/code/dataset.py:343-385``):
    fixed per-epoch ``length`` over a PERSISTENT underlying iterator —
    epoch N+1 continues where epoch N stopped and wraps on StopIteration.
    ``MultiDataset`` is only ever isinstance-checked. ``Dataset`` is a
    functional stand-in for webdataset-0.1's pipeline dataset, covering
    exactly what stage-4's ``MetaWebDataset`` subclass + ``get_dataset``
    pipeline use (data/metawebdataset.py:7-74, data/webdataset.py:82-91):
    ``open_fn``/``shard_hook``/``tarhandler``, ``raw_samples`` override,
    chained ``map``/``map_tuple``/``pipe`` stages with per-stage exception
    handlers, and the ``wds.dataset`` helpers ``tardata``/``base_plus_ext``
    /``valid_sample``/``maybe_collect``/``trace``."""
    import re as _re
    import tarfile as _tarfile
    import warnings as _warnings

    try:
        from torch.utils.data import IterableDataset
    except Exception:  # pragma: no cover - torch is in the image
        IterableDataset = object

    mod = types.ModuleType("webdataset")
    dataset_mod = types.ModuleType("webdataset.dataset")
    dataset_mod.trace = False

    def reraise_exception(exn):
        raise exn

    def tardata(fileobj, handler=reraise_exception):
        """(fname, bytes) pairs from a tar stream (wds 0.1 tariterators)."""
        try:
            stream = _tarfile.open(fileobj=fileobj, mode="r|*")
            for tarinfo in stream:
                if not tarinfo.isreg():
                    continue
                fname = tarinfo.name
                if fname is None:
                    continue
                data = stream.extractfile(tarinfo).read()
                yield fname, data
        except Exception as exn:
            if not handler(exn):
                return

    def base_plus_ext(path):
        """Split 'dir/base.ext' at the FIRST dot of the basename (the
        webdataset sample-grouping convention)."""
        match = _re.match(r"^((?:.*/|)[^.]+)[.]([^/]*)$", path)
        if not match:
            return None, None
        return match.group(1), match.group(2)

    def valid_sample(sample):
        return (
            sample is not None
            and isinstance(sample, dict)
            and len(list(sample.keys())) > 0
            and not sample.get("__bad__", False)
        )

    def maybe_collect():
        pass

    dataset_mod.tardata = tardata
    dataset_mod.base_plus_ext = base_plus_ext
    dataset_mod.valid_sample = valid_sample
    dataset_mod.maybe_collect = maybe_collect

    def _map_stream(data, f, handler):
        for sample in data:
            try:
                result = f(sample)
            except Exception as exn:
                if handler(exn):
                    continue
                else:
                    break
            yield result

    def _map_tuple_stream(data, fs, handler):
        for sample in data:
            try:
                result = tuple(f(x) for f, x in zip(fs, sample))
            except Exception as exn:
                if handler(exn):
                    continue
                else:
                    break
            yield result

    class Dataset(IterableDataset):
        def __init__(self, urls, *, handler=reraise_exception,
                     initial_pipeline=None, **kwargs):
            super().__init__()
            self.urls = list(urls)
            self.handler = handler
            self.tarhandler = handler
            self.pipeline = list(initial_pipeline or [])

        def open_fn(self, url):
            return open(url, "rb")

        def shard_hook(self):
            pass

        def raw_samples(self, urls):  # subclasses override (MetaWebDataset)
            for url in urls:
                with self.open_fn(url) as stream:
                    yield from tardata(stream, handler=self.tarhandler)

        def __iter__(self):
            data = self.raw_samples(self.urls)
            for stage in self.pipeline:
                data = stage(data)
            return iter(data)

        def map(self, f, handler=None):
            h = handler or self.handler
            self.pipeline.append(
                lambda data, f=f, h=h: _map_stream(data, f, h))
            return self

        def map_tuple(self, *fs, handler=None):
            h = handler or self.handler
            self.pipeline.append(
                lambda data, fs=tuple(fs), h=h: _map_tuple_stream(data, fs, h))
            return self

        def pipe(self, f):
            self.pipeline.append(f)
            return self

    class MultiDataset:
        pass

    class ResizedDataset(IterableDataset):
        def __init__(self, dataset, length=None, nominal=None):
            super().__init__()
            self.dataset = dataset
            if length is None:
                length = len(dataset)
            self.length = length
            self.nominal = self.length if nominal is None else nominal
            self.source = None

        def __len__(self):
            return self.nominal

        def __getstate__(self):
            result = dict(self.__dict__)
            result["source"] = None
            return result

        def __iter__(self):
            if self.source is None:
                self.source = iter(self.dataset)
            for _ in range(self.length):
                try:
                    sample = next(self.source)
                except StopIteration:
                    self.source = iter(self.dataset)
                    sample = next(self.source)
                yield sample

    def warn_and_continue(exn):
        _warnings.warn(repr(exn))
        return True

    mod.Dataset = Dataset
    mod.MultiDataset = MultiDataset
    mod.ResizedDataset = ResizedDataset
    mod.ChoppedDataset = ResizedDataset
    mod.warn_and_continue = warn_and_continue
    mod.reraise_exception = reraise_exception
    mod.dataset = dataset_mod
    sys.modules["webdataset.dataset"] = dataset_mod
    return mod


_SHIMS_INSTALLED = False


def install_shims():
    """Idempotently install the dependency shims into sys.modules (only for
    names that are genuinely absent from the image)."""
    global _SHIMS_INSTALLED
    if _SHIMS_INSTALLED:
        return
    if "torch_scatter" not in sys.modules:
        try:
            importlib.import_module("torch_scatter")
        except ImportError:
            sys.modules["torch_scatter"] = _make_torch_scatter_shim()
    if "diffdist" not in sys.modules:
        try:
            importlib.import_module("diffdist")
        except ImportError:
            pkg, functional = _make_diffdist_shim()
            sys.modules["diffdist"] = pkg
            sys.modules["diffdist.functional"] = functional
    if "braceexpand" not in sys.modules:
        try:
            importlib.import_module("braceexpand")
        except ImportError:
            sys.modules["braceexpand"] = _make_braceexpand_shim()
    if "wget" not in sys.modules:
        try:
            importlib.import_module("wget")
        except ImportError:
            # imported (not called) by clustering/code/utils.py:11
            wget = types.ModuleType("wget")
            wget.download = None
            sys.modules["wget"] = wget
    if "inflection" not in sys.modules:
        try:
            importlib.import_module("inflection")
        except ImportError:
            # models/__init__.py:9 uses only `underscore` (CamelCase ->
            # snake_case: LayerSlowFast -> layer_slow_fast)
            import re

            mod = types.ModuleType("inflection")

            def underscore(word):
                word = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", word)
                word = re.sub(r"([a-z\d])([A-Z])", r"\1_\2", word)
                return word.replace("-", "_").lower()

            mod.underscore = underscore
            sys.modules["inflection"] = mod
    if "webdataset" not in sys.modules:
        try:
            importlib.import_module("webdataset")
        except ImportError:
            # subset_selection only imports it (feature_loaders/loader.py:8);
            # the stage-5 driver actually USES ResizedDataset and
            # isinstance-checks MultiDataset (run_clustering.py:155,
            # data/clustering.py:61) — provide functional stand-ins.
            sys.modules["webdataset"] = _make_webdataset_shim()
    _SHIMS_INSTALLED = True


def install_fvcore_shims():
    """Idempotently provide the three fvcore surfaces the reference's
    evaluation code imports (fvcore is absent in-image):

    * ``fvcore.common.registry.Registry`` — name->class registry
      (models/build.py:4);
    * ``fvcore.nn.weight_init.c2_msra_fill`` — caffe2 MSRA conv init
      (utils/weight_init_helper.py:4): kaiming-normal fan_out on weight,
      zero bias;
    * ``fvcore.common.timer.Timer`` — wall-clock timer (utils/meters.py).

    Augments a partially-installed shim (an earlier test may have installed
    only ``common.timer``).
    """
    try:
        importlib.import_module("fvcore.common.registry")
        return  # real fvcore present
    except ImportError:
        pass

    import time

    fv = sys.modules.get("fvcore") or types.ModuleType("fvcore")
    common = sys.modules.get("fvcore.common") or types.ModuleType("fvcore.common")
    if "fvcore.common.timer" not in sys.modules:
        timer = types.ModuleType("fvcore.common.timer")

        class Timer:
            def __init__(self):
                self.reset()

            def reset(self):
                self._start = time.perf_counter()
                self._paused = None
                self._total_paused = 0.0

            def pause(self):
                if self._paused is None:
                    self._paused = time.perf_counter()

            def seconds(self):
                end = self._paused if self._paused is not None else time.perf_counter()
                return end - self._start - self._total_paused

        timer.Timer = Timer
        sys.modules["fvcore.common.timer"] = timer
        common.timer = timer

    if "fvcore.common.registry" not in sys.modules:
        registry = types.ModuleType("fvcore.common.registry")

        class Registry:
            def __init__(self, name):
                self._name = name
                self._obj_map = {}

            def register(self, obj=None):
                if obj is None:
                    def deco(fn_or_class):
                        self._obj_map[fn_or_class.__name__] = fn_or_class
                        return fn_or_class
                    return deco
                self._obj_map[obj.__name__] = obj
                return obj

            def get(self, name):
                return self._obj_map[name]

        registry.Registry = Registry
        sys.modules["fvcore.common.registry"] = registry
        common.registry = registry

    if "fvcore.nn" not in sys.modules:
        import torch.nn

        fvnn = types.ModuleType("fvcore.nn")
        weight_init = types.ModuleType("fvcore.nn.weight_init")

        def c2_msra_fill(module):
            torch.nn.init.kaiming_normal_(
                module.weight, mode="fan_out", nonlinearity="relu")
            if module.bias is not None:
                torch.nn.init.constant_(module.bias, 0.0)

        weight_init.c2_msra_fill = c2_msra_fill
        fvnn.weight_init = weight_init
        sys.modules["fvcore.nn"] = fvnn
        sys.modules["fvcore.nn.weight_init"] = weight_init
        fv.nn = fvnn

    fv.common = common
    sys.modules.setdefault("fvcore", fv)
    sys.modules.setdefault("fvcore.common", common)


# -- isolated stage imports ---------------------------------------------------

_STAGE_CACHE = {}
# every module a stage's imports ever pulled in, evicted from sys.modules
# between passes and REINSTALLED during later passes for the same stage —
# otherwise a later `import_stage("subset_selection", ["run"])` would give
# run.py a FRESH copy of `measures` distinct from the one the caller holds
# (and patches via f64_measures/unified_shuffles).
_STAGE_SYSMODULES = {}


def import_stage(stage: str, module_names):
    """Import ``module_names`` from ``/root/reference/<stage>/code`` in
    isolation; returns {name: module}. Results are cached per (stage, name);
    all passes for one stage share one consistent module graph.
    """
    install_shims()
    code_dir = REFERENCE / stage / "code"
    assert code_dir.is_dir(), code_dir
    out = {}
    missing = []
    for name in module_names:
        key = (stage, name)
        if key in _STAGE_CACHE:
            out[name] = _STAGE_CACHE[key]
        else:
            missing.append(name)
    if not missing:
        return out

    stage_mods = _STAGE_SYSMODULES.setdefault(stage, {})
    snapshot = set(sys.modules)
    # pre-existing globals this stage graph will shadow (e.g. an unrelated
    # top-level `utils`): remember them so exit RESTORES rather than
    # deletes them (round-3 ADVICE: cross-test pollution risk)
    prior = {n: sys.modules[n] for n in stage_mods if n in sys.modules}
    sys.modules.update(stage_mods)  # re-expose this stage's module graph
    sys.path.insert(0, str(code_dir))
    try:
        for name in missing:
            mod = importlib.import_module(name)
            _STAGE_CACHE[(stage, name)] = mod
            out[name] = mod
    finally:
        sys.path.remove(str(code_dir))
        # evict the stage's modules again (utils/config/save collide between
        # stages); the objects stay alive via the caches.
        for name in (set(sys.modules) - snapshot) | set(stage_mods):
            mod = sys.modules.get(name)
            if mod is None or mod is prior.get(name):
                continue
            path = getattr(mod, "__file__", None) or ""
            # namespace packages (dirs without __init__.py, e.g.
            # evaluation/code/utils) have no __file__ — match on __path__
            # or they leak across stages and shadow same-named modules
            ns_paths = " ".join(str(p) for p in getattr(mod, "__path__", ()) or ())
            if (str(code_dir) in str(path) or str(code_dir) in ns_paths
                    or name in stage_mods or name in ("measures",)):
                stage_mods[name] = mod
                del sys.modules[name]
        for name, mod in prior.items():  # restore shadowed globals
            if sys.modules.get(name) is not mod:
                sys.modules[name] = mod
    return out


@contextlib.contextmanager
def stage_context(stage: str):
    """Re-expose a stage's imported module graph (sys.modules + sys.path)
    for the duration of a call.  ``import_stage`` evicts stage modules after
    importing them; code that resolves imports AT CALL TIME — ``torch.load``
    unpickling a ``sgd_clustering.KMeans``, late ``importlib`` calls —
    needs them back while it runs."""
    install_shims()
    code_dir = REFERENCE / stage / "code"
    stage_mods = _STAGE_SYSMODULES.setdefault(stage, {})
    snapshot = set(sys.modules)
    prior = {n: sys.modules[n] for n in stage_mods if n in sys.modules}
    sys.modules.update(stage_mods)
    sys.path.insert(0, str(code_dir))
    try:
        yield
    finally:
        sys.path.remove(str(code_dir))
        for name in (set(sys.modules) - snapshot) | set(stage_mods):
            mod = sys.modules.get(name)
            if mod is None or mod is prior.get(name):
                continue
            path = getattr(mod, "__file__", None) or ""
            ns_paths = " ".join(str(p) for p in getattr(mod, "__path__", ()) or ())
            if (str(code_dir) in str(path) or str(code_dir) in ns_paths
                    or name in stage_mods or name in ("measures",)):
                stage_mods[name] = mod
                del sys.modules[name]
        for name, mod in prior.items():  # restore shadowed globals
            if sys.modules.get(name) is not mod:
                sys.modules[name] = mod


@contextlib.contextmanager
def torch_load_legacy():
    """torch >= 2.6 flipped ``torch.load``'s default to ``weights_only=True``;
    the reference predates that and pickles whole ``KMeans`` objects in its
    epoch caches (``run_clustering.py:110-117``). Restore the legacy default
    for the duration."""
    import torch

    orig = torch.load

    def load(*args, **kwargs):
        kwargs.setdefault("weights_only", False)
        return orig(*args, **kwargs)

    torch.load = load
    try:
        yield
    finally:
        torch.load = orig


def subset_selection_modules(names=("measures", "pairing", "run_greedy")):
    return import_stage("subset_selection", names)


def clustering_modules(names=("sgd_clustering",)):
    return import_stage("clustering", names)


# -- runtime patches ----------------------------------------------------------

@contextlib.contextmanager
def patch_cuda():
    """Make ``Tensor.cuda()`` a no-op (CPU-only torch; reference
    ``sgd_clustering.py:113`` hard-calls it on the scatter output)."""
    import torch

    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


@contextlib.contextmanager
def f64_measures(mi_module):
    """Run the reference measures in float64.

    The reference's contingency math executes in torch's default f32 (its
    ``torch.full((P,C,C), eps)`` cache and ``one_hot(..., torch.float)``
    candidates, ``measures/mi.py:35,69-74``) even though eps is the float64
    machine eps. For math-level parity assertions at 1e-12 we lift the same
    code to f64: default dtype -> float64 and the one_hot output cast to the
    default dtype. No arithmetic is altered.
    """
    import torch

    orig_default = torch.get_default_dtype()
    orig_one_hot = mi_module.EfficientMI.__dict__["one_hot"]
    orig_fn = orig_one_hot.__func__

    def one_hot_default_dtype(x, N, default=0, value=1):
        return orig_fn(x, N, default, value).to(torch.get_default_dtype())

    torch.set_default_dtype(torch.float64)
    mi_module.EfficientMI.one_hot = staticmethod(one_hot_default_dtype)
    try:
        yield
    finally:
        torch.set_default_dtype(orig_default)
        mi_module.EfficientMI.one_hot = orig_one_hot


class NS(types.SimpleNamespace):
    """Tiny recursive namespace standing in for the reference's
    ``DefaultMunch`` args bags (missing keys -> None; Munch is a dict
    subclass, so `in` / [] work on keys — models/__init__.py:55-60)."""

    def __getattr__(self, name):  # only called when attribute is absent
        if name.startswith("__") and name.endswith("__"):
            # pickle probes __setstate__/__reduce_ex__ etc. and would try
            # to CALL a None — keep protocol lookups honest
            raise AttributeError(name)
        return None

    def __contains__(self, name):
        return name in self.__dict__

    def __getitem__(self, name):
        return self.__dict__[name]

    def __setitem__(self, name, value):
        self.__dict__[name] = value

    @classmethod
    def make(cls, dt):
        return cls(**{
            k: cls.make(v) if isinstance(v, dict) else v for k, v in dt.items()
        })


def make_selection_args(**overrides):
    """args bag consumed by ``run_greedy._run_greedy`` / ``run.py``
    (reference ``subset_selection/code/config.py:1-53`` defaults)."""
    base = {
        "batch": {"batch_size": 20, "selection_size": 4, "keep_unselected": True},
        "computation": {"device": "cpu", "num_workers": 1},
        "subset": {"ratio": 0.2, "size": None},
        "clustering": {"pairing": "combination"},
        "data": {
            "path": None,
            "output": {"path": None},
            "meta": {"path": None},
        },
        "measure_name": "batch_mi",
        "shuffle_candidates": False,
        "log_every": 1000000,
        "log_times": None,
        "node_rank": None,
        "parent_pid": None,
        "verbose": False,
    }

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(base, overrides)
    return NS.make(base)


def make_kmeans_args(device="cpu", num_gpus=1):
    return NS.make({"computation": {"device": device, "num_gpus": num_gpus}})


def make_clustering_args(data_dir, out_dir, spec_name, batch_size=4,
                         ncentroids=4, epochs=2, cached_epoch=None,
                         resume_training=None,
                         models=("layer_slow_fast", "layer_vggish")):
    """args bag consumed by ``clustering/code/run_clustering.py`` driving
    the FULL stage-5 driver on CPU (reference ``clustering/code/config.py``
    defaults, shrunk to test scale). ``data.media.path`` carries the shard
    spec with suffix (get_shards_path strips/replaces it, shards.py:15-19);
    ``data.path``'s basename names the epoch caches (utils.py:30-32)."""
    spec = Path(data_dir) / spec_name
    args = NS.make({
        "models": list(models),
        "model_types": {"audio": ["vggish", "layer_vggish"]},
        "computation": {"device": "cpu", "num_gpus": 1, "num_workers": 0,
                        "discard_shards": False},
        "data": {
            "path": str(spec),
            "media": {"path": None},  # Path set below (NS.make recurses dicts)
            "meta": {"path": None},
            "batch_size": batch_size,
            "output": {"path": Path(out_dir), "shard_ok_ratio": 0.99},
        },
        "clustering": {"ncentroids": ncentroids, "epochs": epochs,
                       "cached_epoch": cached_epoch,
                       "resume_training": resume_training,
                       "load_cache_from_shard_subset": False,
                       "save_scheme_ver2": None},
        "debug": False,
    })
    args.data.media.path = spec  # a real Path (stem/parent are used)
    args.data.types = {}  # a real dict (`in` + subscript, utils.py:19-21)
    return args


@contextlib.contextmanager
def shim_absent_modules(*names):
    """Install EMPTY module shims for genuinely-absent imports (e.g. ``av``,
    ``torchvision`` for stage-4's data/video.py, which imports them at
    module level but whose decode path the driver tests inject). Removed on
    exit so later ``pytest.importorskip`` calls still see the truth; the
    reference modules imported meanwhile keep their (unused) bindings."""
    installed = []
    try:
        for name in names:
            if name in sys.modules:
                continue
            try:
                importlib.import_module(name)
            except ImportError:
                shim = types.ModuleType(name)
                shim._acav_fake = True
                sys.modules[name] = shim
                installed.append(name)
        yield
    finally:
        for name in installed:
            sys.modules.pop(name, None)


def make_extraction_args(data_dir, out_dir, spec_name, batch_size=4,
                         num_frames=4, duration=1.0, shard_ok_ratio=0.99,
                         save_cache_every=1,
                         models=("fake_audio", "fake_video"),
                         audio_models=("fake_audio",)):
    """args bag consumed by ``feature_extraction/code/run_extraction.py``
    driving the FULL stage-4 driver on CPU (reference
    ``feature_extraction/code/config.py`` defaults, shrunk to test scale).
    ``data.media.path`` carries the tar shard spec (get_shards_path strips
    the suffix via .stem, data/shards.py:15-19)."""
    spec = Path(data_dir) / spec_name
    args = NS.make({
        "models": list(models),
        "model_types": {"audio": list(audio_models)},
        "data": {
            "batch_size": batch_size,
            "media": {"path": None, "num_frames": num_frames},
            "meta": {"path": None},
            "output": {"path": Path(out_dir),
                       "shard_ok_ratio": shard_ok_ratio},
        },
        "computation": {"device": "cpu", "num_gpus": 1, "num_workers": 0,
                        "discard_shards": False, "shuffle_bufsize": 0},
        "acav": {"duration": duration, "skip_shorter_ratio": 0.25,
                 "save_cache_every": save_cache_every,
                 "force_cache_restart": False, "use_replicates": False},
        "debug": False,
        "log_period": 1000000,
    })
    args.data.media.path = spec  # a real Path (stem/parent are used)
    args.data.types = {}  # real dict (`in` + subscript, utils.py:19-21)
    return args


@contextlib.contextmanager
def unified_shuffles(mi_or_batch_cls, seed: int):
    """Replace ``EfficientBatchMI.shuffle_candidate_ids``'s torch.randperm
    with a numpy RandomState permutation stream so the reference and the
    repo consume IDENTICAL shuffles (RandomState.shuffle(x) applies the same
    Fisher-Yates swaps as x[RandomState.permutation(len(x))]). This swaps the
    RNG source only — the shuffle-every-iteration algorithm is untouched
    (reference ``measures/batch.py:29-32,94``).
    """
    import numpy as np
    import torch

    rng = np.random.RandomState(seed)
    orig = mi_or_batch_cls.shuffle_candidate_ids

    def shuffle_candidate_ids(self):
        perm = rng.permutation(self.candidate_ids.shape[0])
        self.candidate_ids = self.candidate_ids.index_select(
            0, torch.from_numpy(perm).to(self.candidate_ids.device)
        )

    mi_or_batch_cls.shuffle_candidate_ids = shuffle_candidate_ids
    try:
        yield rng
    finally:
        mi_or_batch_cls.shuffle_candidate_ids = orig


@contextlib.contextmanager
def unified_shuffles_per_instance(mi_or_batch_cls, seed: int):
    """Like ``unified_shuffles`` but each measure INSTANCE gets its own
    ``RandomState(seed)`` stream (created lazily on its first shuffle).
    This matches the repo's chunked-driver semantics — a fresh rng per
    partition/chunk (pipeline/subset_selection.py run_greedy_partition) —
    whereas the reference's torch global RNG would thread one stream
    through every chunk. RNG sourcing only; the algorithm is untouched."""
    import numpy as np
    import torch

    orig = mi_or_batch_cls.shuffle_candidate_ids

    def shuffle_candidate_ids(self):
        rng = getattr(self, "_acav_unified_rng", None)
        if rng is None:
            rng = self._acav_unified_rng = np.random.RandomState(seed)
        perm = rng.permutation(self.candidate_ids.shape[0])
        self.candidate_ids = self.candidate_ids.index_select(
            0, torch.from_numpy(perm).to(self.candidate_ids.device)
        )

    mi_or_batch_cls.shuffle_candidate_ids = shuffle_candidate_ids
    try:
        yield
    finally:
        mi_or_batch_cls.shuffle_candidate_ids = orig

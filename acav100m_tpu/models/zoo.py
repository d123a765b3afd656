"""Checkpoint acquisition + conversion plumbing.

Reference behavior being ported:

* MODEL_ZOO.md URL table parsing — the reference scrapes
  facebookresearch/SlowFast's ``MODEL_ZOO.md`` for ``config -> checkpoint
  URL`` choices and caches them as ``choices.json``
  (``feature_extraction/code/models/utils_slowfast/load_model.py:72-128``).
* weight download with skip-if-cached
  (``load_model.py:63-69``; VGGish via torch.hub,
  ``feature_extraction/code/models/vggish.py:42-64``).
* checkpoint conversion into this package's flax format, exposed as the
  ``convert`` CLI verb: torch/caffe2 state dicts -> ``.npz`` flax trees with
  sha256 checksums, so an egress-enabled environment can run the
  example-shard bit-match immediately (see ``docs/WEIGHTS.md``).

Egress is gated in this image: download helpers raise with runnable
instructions instead of failing obscurely.
"""

from __future__ import annotations

import hashlib
import json
import pickle
import re
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

MODEL_ZOO_URL = (
    "https://raw.githubusercontent.com/facebookresearch/SlowFast/main/MODEL_ZOO.md"
)
SLOWFAST_CONFIG = "Kinetics/c2/SLOWFAST_8x8_R50"  # reference config.py default
VGGISH_URL = (
    "https://github.com/harritaylor/torchvggish/releases/download/"
    "v0.1/vggish-10086976.pth"
)


# -- MODEL_ZOO.md parsing ------------------------------------------------------

def parse_model_zoo(lines: Iterable[str]) -> Dict[str, str]:
    """Markdown zoo tables -> {config: checkpoint_url}.

    Behavioral port of the reference's state machine
    (``load_model.py:82-128``): a table starts at a header row containing
    ``| architecture |``; the ``model`` column holds a markdown link whose
    URL is extracted; the ``config`` column (when present) names the config,
    otherwise the config is derived from the checkpoint filename and
    prefixed ``AVA/c2/`` for AVA-version tables.
    """
    if isinstance(lines, str):
        lines = lines.splitlines()

    def cells(line: str) -> List[str]:
        return [c.strip() for c in line.split("|") if c.strip()]

    data: Dict[str, str] = {}
    state = 0  # 0 = scanning, 1 = skip separator row, 2 = reading rows
    ckpt_col = config_col = -1
    title: Optional[str] = None
    for raw in lines:
        line = raw.strip()
        if state == 2:
            if not line:
                state = 0
                continue
            row = cells(line)
            if max(ckpt_col, config_col) >= len(row):
                continue
            ckpt_cell = row[ckpt_col]
            start = ckpt_cell.find("https://")
            if start < 0:
                continue
            # markdown link `[name](https://...)` -> strip trailing `)`
            url = ckpt_cell[start:].rstrip(")]")
            if config_col < 0:
                config = url.rsplit("/", 1)[-1].split(".")[0]
                config = f"{title}/c2/{config}" if title else None
            else:
                config = row[config_col]
            if url and config:
                data[config] = url
        elif state == 0:
            if line.startswith("| architecture |"):
                header = cells(line)
                ckpt_col = header.index("model") if "model" in header else -1
                config_col = header.index("config") if "config" in header else -1
                title = "AVA" if any("AVA version" in h for h in header) else None
                state = 1
        else:  # separator row under the header
            state = 2
    return data


# -- downloads (egress-gated) --------------------------------------------------

class DownloadGatedError(RuntimeError):
    pass


def fetch_url(url: str, out_path: Path, timeout: float = 60.0) -> Path:
    """Download ``url`` to ``out_path`` (skip if it already exists)."""
    out_path = Path(out_path)
    if out_path.is_file():
        return out_path
    out_path.parent.mkdir(parents=True, exist_ok=True)
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            data = r.read()
    except Exception as exc:  # no egress in this image
        raise DownloadGatedError(
            f"cannot fetch {url} ({exc!r}). This environment has no network "
            f"egress; on a connected machine run\n"
            f"  curl -L -o {out_path} '{url}'\n"
            f"then re-run the same command."
        ) from exc
    tmp = out_path.with_suffix(out_path.suffix + ".part")
    tmp.write_bytes(data)
    tmp.rename(out_path)
    return out_path


def get_model_zoo(cache_dir: Path) -> Dict[str, str]:
    """{config: url} choices, cached as ``choices.json``
    (reference ``load_model.py:72-77``)."""
    cache_dir = Path(cache_dir)
    cache_path = cache_dir / "choices.json"
    if cache_path.is_file():
        return json.loads(cache_path.read_text())
    md_path = fetch_url(MODEL_ZOO_URL, cache_dir / "MODEL_ZOO.md")
    choices = parse_model_zoo(md_path.read_text())
    cache_dir.mkdir(parents=True, exist_ok=True)
    cache_path.write_text(json.dumps(choices, indent=1))
    return choices


def fetch_weights(config: str, cache_dir: Path,
                  choices: Optional[Dict[str, str]] = None) -> Path:
    """Download the checkpoint for ``config`` (reference load_weights,
    ``load_model.py:63-69``)."""
    cache_dir = Path(cache_dir)
    if config == "vggish":
        return fetch_url(VGGISH_URL, cache_dir / "vggish-10086976.pth")
    if choices is None:
        choices = get_model_zoo(cache_dir)
    if config not in choices:
        raise KeyError(
            f"no checkpoint named {config!r} in the model zoo "
            f"({len(choices)} entries)"
        )
    return fetch_url(choices[config], cache_dir / f"{config.replace('/', '_')}.pkl")


# -- flax npz round trip --------------------------------------------------------

def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_flax_npz(tree: Dict, path: Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flatten_tree(tree))
    return path


def load_flax_npz(path: Path) -> Dict:
    with np.load(path) as z:
        return unflatten_tree({k: z[k] for k in z.files})


def sha256_file(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


# -- torch / caffe2 checkpoint loading -----------------------------------------

def load_torch_checkpoint(path: Path) -> Dict[str, np.ndarray]:
    """Torch ``.pt/.pth/.pyth`` or pickle ``.pkl`` checkpoint -> flat
    {name: np.ndarray}.

    Handles the containers the reference encounters: PySlowFast save files
    (``{'model_state': ...}``), plain ``state_dict``s, torch.hub VGGish
    (flat), and caffe2 pickles (``{'blobs': ...}``, latin1-encoded).
    """
    path = Path(path)
    obj = None
    if path.suffix == ".pkl":
        with open(path, "rb") as f:
            obj = pickle.load(f, encoding="latin1")
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
    for container in ("blobs", "model_state", "state_dict", "model"):
        if isinstance(obj, dict) and container in obj and isinstance(obj[container], dict):
            obj = obj[container]
            break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        if isinstance(v, np.ndarray):
            out[str(k)] = v
    return out


# caffe2 blob name -> PySlowFast module name. Rule shapes follow PySlowFast's
# own converter (slowfast/utils/checkpoint.py, applied by the reference via
# load_checkpoint(convert_from_caffe2=True), load_model.py:36-46): stems are
# `conv1`/`res_conv1_bn`, blocks `res{n}_{j}_branch{1,2a,2b,2c}`, fuse convs
# `t_pool1_subsample` (after s1) and `t_res{n}_{j}_branch2c_bn_subsample`
# (after s2..s4), fast-pathway blobs carry a `_fast` infix, and BN stats use
# the caffe2 suffixes s/b/rm/riv. Unknown blobs raise (loud-fail: see
# docs/WEIGHTS.md for the upstream-rewrite fallback).
_BN_SUFFIX = {"s": "weight", "b": "bias", "rm": "running_mean", "riv": "running_var"}


def caffe2_to_pyslowfast(blobs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Translate caffe2 blob names to PySlowFast state-dict names.

    Returns a dict consumable by
    :func:`acav100m_tpu.models.slowfast.convert_pyslowfast_state_dict`.
    Raises ``ValueError`` listing every blob it cannot map.
    """
    out: Dict[str, np.ndarray] = {}
    unmapped: List[str] = []
    for name, value in blobs.items():
        if name.endswith("_momentum") or name.startswith(("pred_", "fc_", "last_")):
            continue  # optimizer state / classification head: unused by taps
        pathway = 1 if "_fast" in name else 0
        key = name.replace("_fast", "")
        new = _translate_one(key, pathway)
        if new is None:
            unmapped.append(name)
        else:
            out[new] = np.asarray(value)
    if unmapped:
        raise ValueError(
            "unmapped caffe2 blobs (naming drift? see docs/WEIGHTS.md "
            f"fallback): {sorted(unmapped)[:20]}"
            + ("..." if len(unmapped) > 20 else "")
        )
    return out


def _translate_one(key: str, pathway: int) -> Optional[str]:
    pw = f"pathway{pathway}"
    # fuse after s1: t_pool1_subsample{_bn}_{suffix}
    m = re.fullmatch(r"t_pool1_subsample_bn_(s|b|rm|riv)", key)
    if m:
        return f"s1_fuse.bn.{_BN_SUFFIX[m.group(1)]}"
    m = re.fullmatch(r"t_pool1_subsample_w", key)
    if m:
        return "s1_fuse.conv_f2s.weight"
    # fuse after s2..s4: t_res{n}_{j}_branch2c_bn_subsample
    m = re.fullmatch(r"t_res([0-9]+)_[0-9]+_branch2c_bn_subsample_bn_(s|b|rm|riv)", key)
    if m:
        return f"s{m.group(1)}_fuse.bn.{_BN_SUFFIX[m.group(2)]}"
    m = re.fullmatch(r"t_res([0-9]+)_[0-9]+_branch2c_bn_subsample_w", key)
    if m:
        return f"s{m.group(1)}_fuse.conv_f2s.weight"
    # stem: conv1_w / res_conv1_bn_*
    if key == "conv1_w":
        return f"s1.{pw}_stem.conv.weight"
    m = re.fullmatch(r"res_conv1_bn_(s|b|rm|riv)", key)
    if m:
        return f"s1.{pw}_stem.bn.{_BN_SUFFIX[m.group(1)]}"
    # blocks: res{n}_{j}_branch1_w, res{n}_{j}_branch2{a,b,c}_w, + bns
    m = re.fullmatch(r"res([0-9]+)_([0-9]+)_branch1_w", key)
    if m:
        return f"s{m.group(1)}.{pw}_res{m.group(2)}.branch1.weight"
    m = re.fullmatch(r"res([0-9]+)_([0-9]+)_branch1_bn_(s|b|rm|riv)", key)
    if m:
        return f"s{m.group(1)}.{pw}_res{m.group(2)}.branch1_bn.{_BN_SUFFIX[m.group(3)]}"
    m = re.fullmatch(r"res([0-9]+)_([0-9]+)_branch2([abc])_w", key)
    if m:
        return f"s{m.group(1)}.{pw}_res{m.group(2)}.branch2.{m.group(3)}.weight"
    m = re.fullmatch(r"res([0-9]+)_([0-9]+)_branch2([abc])_bn_(s|b|rm|riv)", key)
    if m:
        return (
            f"s{m.group(1)}.{pw}_res{m.group(2)}.branch2."
            f"{m.group(3)}_bn.{_BN_SUFFIX[m.group(4)]}"
        )
    return None


def pyslowfast_to_caffe2_name(name: str) -> Optional[str]:
    """Inverse of :func:`_translate_one` (testing aid: synthesizes caffe2
    checkpoints from PySlowFast names to validate the round trip)."""
    inv_bn = {v: k for k, v in _BN_SUFFIX.items()}

    def bn_sfx(leaf):
        return inv_bn[leaf]

    m = re.fullmatch(r"s1_fuse\.bn\.(\w+)", name)
    if m:
        return f"t_pool1_subsample_bn_{bn_sfx(m.group(1))}"
    if name == "s1_fuse.conv_f2s.weight":
        return "t_pool1_subsample_w"
    m = re.fullmatch(r"s([0-9]+)_fuse\.bn\.(\w+)", name)
    if m:
        return f"t_res{m.group(1)}_0_branch2c_bn_subsample_bn_{bn_sfx(m.group(2))}"
    m = re.fullmatch(r"s([0-9]+)_fuse\.conv_f2s\.weight", name)
    if m:
        return f"t_res{m.group(1)}_0_branch2c_bn_subsample_w"
    m = re.fullmatch(r"s1\.pathway([01])_stem\.conv\.weight", name)
    if m:
        base = "conv1_w"
    else:
        m = re.fullmatch(r"s1\.pathway([01])_stem\.bn\.(\w+)", name)
        if m:
            base = f"res_conv1_bn_{bn_sfx(m.group(2))}"
        else:
            m = re.fullmatch(r"s([0-9]+)\.pathway([01])_res([0-9]+)\.branch1\.weight", name)
            if m:
                return _fastify(f"res{m.group(1)}_{m.group(3)}_branch1_w", m.group(2))
            m = re.fullmatch(
                r"s([0-9]+)\.pathway([01])_res([0-9]+)\.branch1_bn\.(\w+)", name
            )
            if m:
                return _fastify(
                    f"res{m.group(1)}_{m.group(3)}_branch1_bn_{bn_sfx(m.group(4))}",
                    m.group(2),
                )
            m = re.fullmatch(
                r"s([0-9]+)\.pathway([01])_res([0-9]+)\.branch2\.([abc])\.weight", name
            )
            if m:
                return _fastify(
                    f"res{m.group(1)}_{m.group(3)}_branch2{m.group(4)}_w", m.group(2)
                )
            m = re.fullmatch(
                r"s([0-9]+)\.pathway([01])_res([0-9]+)\.branch2\.([abc])_bn\.(\w+)",
                name,
            )
            if m:
                return _fastify(
                    f"res{m.group(1)}_{m.group(3)}_branch2{m.group(4)}_bn_"
                    f"{bn_sfx(m.group(5))}",
                    m.group(2),
                )
            return None
    return _fastify(base, m.group(1))


def _fastify(base: str, pathway: str) -> str:
    if pathway == "0":
        return base
    # the `_fast` infix sits before the parameter-kind suffix
    for sfx in ("_w", "_bn_s", "_bn_b", "_bn_rm", "_bn_riv"):
        if base.endswith(sfx):
            return base[: -len(sfx)] + "_fast" + sfx
    return base + "_fast"


# -- convert verb ---------------------------------------------------------------

def convert_checkpoint(
    model: str, in_path: Path, out_path: Path, fmt: Optional[str] = None
) -> Dict:
    """torch/caffe2 checkpoint -> flax ``.npz`` + sha256 manifest.

    model: 'slowfast' | 'vggish'. fmt: 'pyslowfast' (torch module names,
    default for slowfast), 'caffe2' (blob names, auto-detected for .pkl
    inputs), or 'vggish'.
    """
    in_path, out_path = Path(in_path), Path(out_path)
    sd = load_torch_checkpoint(in_path)
    if model == "slowfast":
        from .slowfast import convert_pyslowfast_state_dict

        if fmt is None:
            fmt = "caffe2" if any("branch2a" in k or k == "conv1_w" for k in sd) else "pyslowfast"
        if fmt == "caffe2":
            sd = caffe2_to_pyslowfast(sd)
        tree = convert_pyslowfast_state_dict(sd)
    elif model == "vggish":
        from .vggish import convert_torch_state_dict

        tree = convert_torch_state_dict(sd)
    else:
        raise ValueError(f"unknown model {model!r} (slowfast|vggish)")
    save_flax_npz(tree, out_path)
    manifest = {
        "model": model,
        "format": fmt or model,
        "input": str(in_path),
        "input_sha256": sha256_file(in_path),
        "output": str(out_path),
        "output_sha256": sha256_file(out_path),
        "num_params": len(flatten_tree(tree)),
    }
    Path(str(out_path) + ".json").write_text(json.dumps(manifest, indent=1))
    return manifest

"""ctypes bindings for the native tar indexer (``native/tario.cc``).

Compiles ``libtario.so`` with g++ on first use (cached next to the source);
falls back to Python ``tarfile`` when no compiler is available. The native
path turns tar member iteration into one header walk + offset ``pread``s —
the host CPU budget belongs to decode, not to Python tar parsing.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Dict, List, Optional, Tuple

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "tario.cc"
_SO = _SRC.parent / "libtario.so"
_lock = threading.Lock()
_lib = None
_load_failed = False


class _TarEntry(ctypes.Structure):
    _fields_ = [
        ("name", ctypes.c_char_p),
        ("offset", ctypes.c_uint64),
        ("size", ctypes.c_uint64),
    ]


def _build() -> bool:
    import shutil

    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None or not _SRC.is_file():
        return False
    cmd = [gxx, "-O2", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
        return proc.returncode == 0 and _SO.is_file()
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _SO.is_file() and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            _load_failed = True
            return None
        lib.tario_index.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(_TarEntry)),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.tario_index.restype = ctypes.c_int
        lib.tario_free.argtypes = [ctypes.POINTER(_TarEntry), ctypes.c_uint64]
        lib.tario_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_char_p,
        ]
        lib.tario_read.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def index_tar(path) -> Optional[List[Tuple[str, int, int]]]:
    """[(member_name, data_offset, size)] via the native walk, or None."""
    lib = get_lib()
    if lib is None:
        return None
    entries = ctypes.POINTER(_TarEntry)()
    count = ctypes.c_uint64()
    rc = lib.tario_index(str(path).encode(), ctypes.byref(entries),
                         ctypes.byref(count))
    if rc != 0:
        return None
    try:
        return [
            (
                entries[i].name.decode("utf-8", errors="replace"),
                int(entries[i].offset),
                int(entries[i].size),
            )
            for i in range(count.value)
        ]
    finally:
        lib.tario_free(entries, count)


def read_member(path, offset: int, size: int) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(size)
    got = lib.tario_read(str(path).encode(), offset, size, buf)
    if got != size:
        return None
    return buf.raw

"""ctypes bindings to the native IO library (native/fastio.cpp).

The shared library is built on demand with the checked-in Makefile (g++ is
part of the toolchain; pybind11 is not, so the ABI is plain C + ctypes).
Callers treat any failure here as "use the Python parser" — see
``VectorStore.from_text_file``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libfastio.so"
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    for name in ("fastio_parse_text", "fastio_parse_binary"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
    lib.fastio_free.restype = None
    lib.fastio_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _parse(fn_name: str, path: Path, max_words: int | None
           ) -> tuple[list[str], np.ndarray]:
    lib = _load()
    vecs_p = ctypes.POINTER(ctypes.c_float)()
    words_p = ctypes.c_char_p()
    words_len = ctypes.c_long()
    n = ctypes.c_long()
    d = ctypes.c_long()
    rc = getattr(lib, fn_name)(
        str(path).encode(), ctypes.c_long(max_words or 0),
        ctypes.byref(vecs_p), ctypes.byref(words_p),
        ctypes.byref(words_len), ctypes.byref(n), ctypes.byref(d))
    if rc != 0:
        raise OSError(f"{fn_name} failed with code {rc} for {path}")
    try:
        count, dim = n.value, d.value
        vecs = np.ctypeslib.as_array(vecs_p, shape=(count, dim)).copy()
        blob = ctypes.string_at(words_p, words_len.value)
        words = blob.decode("utf-8", errors="replace").split("\n")[:count]
    finally:
        lib.fastio_free(ctypes.cast(vecs_p, ctypes.c_void_p))
        lib.fastio_free(ctypes.cast(words_p, ctypes.c_void_p))
    return words, vecs


def load_text_embeddings(path: Path, max_words: int | None = None
                         ) -> tuple[list[str], np.ndarray]:
    """word2vec text format via the native parser."""
    return _parse("fastio_parse_text", path, max_words)


def load_binary_embeddings(path: Path, max_words: int | None = None
                           ) -> tuple[list[str], np.ndarray]:
    """word2vec .bin format via the native parser (replaces the reference's
    gensim conversion step, transform_vecs.py)."""
    return _parse("fastio_parse_binary", path, max_words)

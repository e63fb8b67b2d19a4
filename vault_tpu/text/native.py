"""ctypes wrapper for the native WordPiece core (native/wordpiece.cpp).

Routing policy: the C++ path handles ASCII basic tokenization identically to
the Python tokenizer; any text with non-ASCII characters (accents, CJK,
emoji) falls back to Python.  ``WordPieceTokenizer.tokenize`` consults this
wrapper transparently when the shared library has been built
(``make -C native``)."""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libwordpiece.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                              ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_tokenize.restype = ctypes.c_int32
    lib.wp_tokenize.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    _lib = lib
    return lib


def build_native_lib() -> bool:
    """Compile the shared library in-tree (idempotent)."""
    import subprocess

    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


class NativeWordPiece:
    """Tokenize ASCII text to ids with the C++ core.  Returns None for
    inputs the native path doesn't cover (non-ASCII)."""

    def __init__(self, vocab: Dict[str, int], unk_id: int,
                 lowercase: bool = True, max_chars_per_word: int = 100):
        lib = _load_lib()
        self._lib = lib
        self._handle = None
        self._buf = (ctypes.c_int32 * 4096)()
        if lib is None:
            return
        # id order must match vocab values: build dense token array
        items = sorted(vocab.items(), key=lambda kv: kv[1])
        if [v for _, v in items] != list(range(len(items))):
            return  # sparse ids unsupported; fall back entirely
        arr = (ctypes.c_char_p * len(items))()
        self._keepalive = [k.encode("utf-8") for k, _ in items]
        for i, b in enumerate(self._keepalive):
            arr[i] = b
        self._handle = lib.wp_create(arr, len(items), unk_id,
                                     1 if lowercase else 0, max_chars_per_word)

    @property
    def available(self) -> bool:
        return self._handle is not None

    def tokenize_to_ids(self, text: str) -> Optional[List[int]]:
        if self._handle is None or not text.isascii():
            return None
        n = self._lib.wp_tokenize(self._handle, text.encode("ascii"),
                                  self._buf, len(self._buf))
        return list(self._buf[:n])

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            self._lib.wp_free(self._handle)

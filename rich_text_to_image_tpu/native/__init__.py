"""Native (C++) runtime components, built on demand with g++ + ctypes."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_FAILED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def load_bpe_lib():
    """Compile (once) and load libbpe.so; returns None if unavailable."""
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        src = os.path.join(os.path.dirname(__file__), "bpe.cpp")
        so = os.path.join(_build_dir(), "libbpe.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.bpe_create.restype = ctypes.c_void_p
            lib.bpe_destroy.argtypes = [ctypes.c_void_p]
            lib.bpe_add_merge.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.bpe_encode_word.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.bpe_encode_word.restype = ctypes.c_int
            _LIB = lib
        except Exception:
            _FAILED = True
            _LIB = None
        return _LIB


class NativeBPE:
    """ctypes wrapper over the C++ merge loop. API: bpe(word) → 'sym sym…'."""

    def __init__(self, merges):
        lib = load_bpe_lib()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        self._h = lib.bpe_create()
        for rank, (a, b) in enumerate(merges):
            lib.bpe_add_merge(
                self._h, a.encode("utf-8"), b.encode("utf-8"), rank
            )
        self._buf = ctypes.create_string_buffer(1 << 16)

    def __call__(self, token: str) -> str:
        n = self._lib.bpe_encode_word(
            self._h, token.encode("utf-8"), self._buf, len(self._buf)
        )
        if n < 0:
            raise ValueError("token too long for native BPE buffer")
        if n == 0:
            return token + "</w>"
        return self._buf.value.decode("utf-8")

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._h)
        except Exception:
            pass

"""ctypes bindings for the native atomic-file reader (native/fast_tsv.cpp).

Build-on-first-use: compiles the shared library with the system C++ compiler
into a user cache directory; every entry point degrades to the pandas reader
when the toolchain or build is unavailable, so the native path is a pure
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from logging import getLogger

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "fast_tsv.cpp",
)
_LIB = None
_TRIED = False


def _build_library():
    if not os.path.isfile(_SRC):
        return None
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "RECBOLE_FAIRREC_TPU_NATIVE_CACHE",
        os.path.expanduser("~/.cache/recbole_fairrec_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"fast_tsv-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", so_path],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return so_path
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("RECBOLE_FAIRREC_TPU_NO_NATIVE"):
        return None
    so_path = _build_library()
    if so_path is None:
        getLogger().debug("native fast_tsv unavailable; using pandas reader")
        return None
    lib = ctypes.CDLL(so_path)
    lib.tsv_open.restype = ctypes.c_void_p
    lib.tsv_open.argtypes = [
        ctypes.c_char_p, ctypes.c_char,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.tsv_n_rows.restype = ctypes.c_longlong
    lib.tsv_n_rows.argtypes = [ctypes.c_void_p]
    lib.tsv_error.restype = ctypes.c_char_p
    lib.tsv_error.argtypes = [ctypes.c_void_p]
    lib.tsv_float_col.restype = ctypes.POINTER(ctypes.c_double)
    lib.tsv_float_col.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tsv_token_codes.restype = ctypes.POINTER(ctypes.c_int32)
    lib.tsv_token_codes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tsv_token_uniques.restype = ctypes.POINTER(ctypes.c_char)
    lib.tsv_token_uniques.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_longlong)
    ]
    lib.tsv_token_n_uniques.restype = ctypes.c_longlong
    lib.tsv_token_n_uniques.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tsv_close.restype = None
    lib.tsv_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def read_columns(filepath, sep, col_indices, col_is_token):
    """Parse the file in one native pass.

    Args:
        filepath: path to the headered TSV.
        sep: single-char field separator.
        col_indices: physical column numbers to extract.
        col_is_token: parallel bools — True → token column.

    Returns:
        list aligned with col_indices: float columns as float64 arrays, token
        columns as object arrays of the ORIGINAL strings (uniques[codes], so
        downstream factorize/remap semantics are byte-identical to pandas).
        None when the native library is unavailable or parsing failed.
    """
    lib = _get_lib()
    if lib is None:
        return None
    n = len(col_indices)
    idx_arr = (ctypes.c_int * n)(*col_indices)
    tok_arr = (ctypes.c_int * n)(*[1 if t else 0 for t in col_is_token])
    handle = lib.tsv_open(filepath.encode(), sep.encode()[:1], idx_arr, tok_arr, n)
    try:
        err = lib.tsv_error(handle)
        if err:
            getLogger().debug("fast_tsv error for %s: %s", filepath, err.decode())
            return None
        rows = int(lib.tsv_n_rows(handle))
        out = []
        for slot, is_token in enumerate(col_is_token):
            if is_token:
                codes_ptr = lib.tsv_token_codes(handle, slot)
                codes = np.ctypeslib.as_array(codes_ptr, shape=(rows,)).copy()
                total_len = ctypes.c_longlong()
                buf = lib.tsv_token_uniques(handle, slot, ctypes.byref(total_len))
                n_uniques = int(lib.tsv_token_n_uniques(handle, slot))
                raw = ctypes.string_at(buf, total_len.value).decode("utf-8")
                uniques = np.array(raw.split("\n") if n_uniques else [], dtype=object)
                values = np.empty(rows, dtype=object)
                valid = codes >= 0
                values[valid] = uniques[codes[valid]]
                values[~valid] = None  # missing token -> NaN downstream
                out.append(values)
            else:
                ptr = lib.tsv_float_col(handle, slot)
                out.append(np.ctypeslib.as_array(ptr, shape=(rows,)).copy())
        return out
    finally:
        lib.tsv_close(handle)

"""Native host-ingest kernels (C++ via ctypes).

Builds libkgt_native.so on first use (g++ is in the base image) and exposes:
  - bgzf_decompress(path): parallel-block BGZF decompression
  - parse_genotypes(...): per-record VCF genotype-column tokenisation

The pure-Python paths remain as fallbacks when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["native_available", "bgzf_decompress", "parse_genotypes"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCE = os.path.join(_HERE, "kgt_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libkgt_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, _SOURCE, "-lz", "-lpthread",
    ]
    try:
        result = subprocess.run(cmd, capture_output=True, timeout=120)
        return result.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.isfile(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SOURCE)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.kgt_bgzf_decompress.restype = ctypes.c_void_p
        lib.kgt_bgzf_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.kgt_free.argtypes = [ctypes.c_void_p]
        lib.kgt_vcf_parse_genotypes.restype = ctypes.c_int
        lib.kgt_vcf_parse_genotypes.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.kgt_count_lines.restype = ctypes.c_long
        lib.kgt_count_lines.argtypes = [ctypes.c_char_p, ctypes.c_long]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def bgzf_decompress(path: str, threads: int = 0) -> Optional[bytes]:
    """Whole-file parallel BGZF decompression; None if unavailable/error."""
    lib = _get_lib()
    if lib is None:
        return None
    if threads <= 0:
        threads = max((os.cpu_count() or 2) - 1, 1)
    size = ctypes.c_size_t(0)
    ptr = lib.kgt_bgzf_decompress(path.encode(), threads, ctypes.byref(size))
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr, size.value)
    finally:
        lib.kgt_free(ptr)


def parse_genotypes(
    genotype_text: bytes,
    n_samples: int,
    n_alleles: int,
    gt_idx: int,
    ad_idx: int = -1,
    dp_idx: int = -1,
    gq_idx: int = -1,
) -> Optional[Tuple[np.ndarray, ...]]:
    """Tokenise one record's genotype columns. Returns (gt_a, gt_b, ad, dp,
    gq, ad_count) arrays or None if the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    gt_a = np.empty(n_samples, dtype=np.int32)
    gt_b = np.empty(n_samples, dtype=np.int32)
    ad = np.empty(n_samples * (n_alleles + 1), dtype=np.int32)
    dp = np.empty(n_samples, dtype=np.int32)
    gq = np.empty(n_samples, dtype=np.float32)
    ad_count = np.empty(n_samples, dtype=np.int32)
    parsed = lib.kgt_vcf_parse_genotypes(
        genotype_text, len(genotype_text), n_samples, n_alleles,
        gt_idx, ad_idx, dp_idx, gq_idx,
        gt_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        gt_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ad.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        gq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ad_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if parsed != n_samples:
        return None
    return gt_a, gt_b, ad.reshape(n_samples, n_alleles + 1), dp, gq, ad_count

"""ctypes bindings for the native (C++) host data pipeline.

Auto-builds ``libfastvim_native.so`` with the in-tree Makefile on first
import (g++ only; no pybind11). Falls back gracefully — callers check
``available()`` and use the pure-Python path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libfastvim_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fastvim_augment_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_float, ctypes.c_int]
    lib.fastvim_cell_augment_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint64, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.fastvim_native_version.restype = ctypes.c_int
    lib.fastvim_jpeg_dims.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fastvim_jpeg_dims.restype = ctypes.c_int
    lib.fastvim_decode_augment_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_uint64, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.fastvim_decode_augment_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def augment_batch(images: np.ndarray, size: int, seed: int,
                  training: bool, mean: np.ndarray, std: np.ndarray,
                  scale=(0.08, 1.0), num_threads: Optional[int] = None
                  ) -> np.ndarray:
    """images (B, H, W, C) uint8 → (B, size, size, C) float32 normalized."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    images = np.ascontiguousarray(images, np.uint8)
    B, H, W, C = images.shape
    out = np.empty((B, size, size, C), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    nt = num_threads or (os.cpu_count() or 1)
    lib.fastvim_augment_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        B, H, W, C, _fptr(out), size, seed, int(training),
        _fptr(mean), _fptr(std), float(scale[0]), float(scale[1]), nt)
    return out


def jpeg_dims(data: bytes):
    """(H, W) of a JPEG byte stream, or None if not decodable."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.fastvim_jpeg_dims(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data), ctypes.byref(h), ctypes.byref(w))
    return None if rc else (h.value, w.value)


def decode_augment_batch(jpegs, size: int, seed: int, training: bool,
                         mean: np.ndarray, std: np.ndarray,
                         scale=(0.08, 1.0),
                         num_threads: Optional[int] = None):
    """Fused JPEG decode + crop/flip/resize/normalize.

    jpegs: list of B ``bytes`` objects → (out (B, size, size, 3) float32,
    fail (B,) uint8 — 1 where the stream failed to decode and the output
    slot is zero-filled). Decode uses libjpeg DCT scaling so large photos
    skip most IDCT work (decode.cpp).
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    offsets = np.zeros(len(jpegs) + 1, np.int64)
    np.cumsum([len(b) for b in jpegs], out=offsets[1:])
    data = np.frombuffer(b"".join(jpegs), np.uint8)
    B = len(jpegs)
    out = np.empty((B, size, size, 3), np.float32)
    fail = np.zeros(B, np.uint8)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    nt = num_threads or (os.cpu_count() or 1)
    lib.fastvim_decode_augment_batch(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, _fptr(out), size, seed, int(training), _fptr(mean), _fptr(std),
        float(scale[0]), float(scale[1]),
        fail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nt)
    return out, fail


def cell_augment_batch(images: np.ndarray, seed: int, training: bool,
                       mean: Optional[np.ndarray] = None,
                       std: Optional[np.ndarray] = None,
                       num_threads: Optional[int] = None) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    images = np.ascontiguousarray(images, np.float32)
    B, H, W, C = images.shape
    out = np.empty_like(images)
    mp = _fptr(np.ascontiguousarray(mean, np.float32)) if mean is not None \
        else ctypes.POINTER(ctypes.c_float)()
    sp = _fptr(np.ascontiguousarray(std, np.float32)) if std is not None \
        else ctypes.POINTER(ctypes.c_float)()
    nt = num_threads or (os.cpu_count() or 1)
    lib.fastvim_cell_augment_batch(
        _fptr(images), B, H, W, C, _fptr(out), seed, int(training), mp, sp,
        nt)
    return out

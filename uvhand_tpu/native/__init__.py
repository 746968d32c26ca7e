"""Native (C++) host input pipeline: build-on-first-use + ctypes binding.

`pipeline.cpp` fuses the per-sample image work (JPEG decode, Gaussian
pre-blur, affine crop/rotate, pixel noise, [0,1] + mean/std normalize)
into one GIL-free C call — the TPU-side equivalent of the reference's
native data path (its CUDA-stream prefetcher moved bytes; here the host
CPU is the scarce resource, PERF.md round 3 host-pipeline law).

The library is compiled with the system g++ against OpenCV 4.6 +
libjpeg-turbo on first use and cached by source hash under
~/.cache/uvhand_tpu/. Every entry point degrades gracefully: if the
toolchain or headers are missing, `load()` returns None and callers keep
the pure-Python path (the dataset's `native_images="auto"` probes this).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pipeline.cpp")
_LOCK = threading.Lock()
_LIB = "unset"  # tri-state: "unset" | None (unavailable) | CDLL

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _cache_dir() -> str:
    d = os.environ.get("UVHAND_NATIVE_CACHE",
                       os.path.expanduser("~/.cache/uvhand_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_cache_dir(), f"libuvpipeline_{tag}.so")
    if os.path.exists(so):
        return so
    tmp = f"{so}.{os.getpid()}.tmp"  # per-process: concurrent builders race
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-I/usr/include/opencv4", "-o", tmp,
        "-lopencv_core", "-lopencv_imgproc", "-lopencv_imgcodecs", "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic; last writer wins with identical bytes
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None
    return so


def load():
    """Compile (once) and load the library; None if unavailable."""
    global _LIB
    if _LIB != "unset":
        return _LIB
    with _LOCK:
        if _LIB != "unset":
            return _LIB
        if os.environ.get("UVHAND_NATIVE", "1") == "0":
            _LIB = None
            return None
        so = _build()
        if so is None:
            _LIB = None
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _LIB = None
            return None
        lib.uv_process_image.restype = ctypes.c_int
        lib.uv_process_image.argtypes = [
            ctypes.c_char_p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return lib


def available() -> bool:
    return load() is not None


def process_image(path: str, center, bbox_dim: float, augm: dict,
                  img_res: int, fast: bool = False,
                  mean=_MEAN, std=_STD) -> np.ndarray | None:
    """Fused equivalent of `cv2.imread` + `augment.rgb_processing` +
    `augment.normalize_image` (uvhand_tpu/data/arctic.py:215-231).

    Returns the normalized (img_res, img_res, 3) float32 RGB image, or
    None when the library is unavailable or the file cannot be decoded
    (callers fall back to the Python path, which reproduces the
    zero-image / is_valid=0 semantics).
    """
    lib = load()
    if lib is None:
        return None
    # crop_dim exactly as rgb_processing computes it: int(sc * bbox_dim * 200)
    crop_dim = float(int(augm["sc"] * bbox_dim * 200))
    if crop_dim <= 0:
        return None
    pn = np.ascontiguousarray(augm["pn"][:3], np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((img_res, img_res, 3), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.uv_process_image(
        path.encode(), ctypes.c_float(float(center[0])),
        ctypes.c_float(float(center[1])), ctypes.c_float(crop_dim),
        ctypes.c_float(float(augm["rot"])),
        pn.ctypes.data_as(fp), mean.ctypes.data_as(fp),
        std.ctypes.data_as(fp), img_res, int(fast),
        out.ctypes.data_as(fp),
    )
    return out if rc == 0 else None

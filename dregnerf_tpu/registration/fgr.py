"""ctypes bindings for the native FGR classical-registration baseline.

Open3D replacement (conerf/geometry/global_registration.py:96-116
`run_registration`): returns (4x4 pose mapping src->tgt, wall time). The
shared library is built on demand from native/fgr.cpp with the system g++
(no pybind11 in this image; plain C ABI + ctypes).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import time
from typing import Optional, Tuple

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libdregnative.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:  # no toolchain: baseline unavailable
            print(f"[fgr] native build failed: {e}")
            return None
    lib = ctypes.CDLL(so)
    lib.fgr_register.restype = ctypes.c_int
    lib.fgr_register.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ]
    lib.ransac_register.restype = ctypes.c_int
    lib.ransac_register.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    lib.fpfh_features.restype = ctypes.c_int
    lib.fpfh_features.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def _fgr_once(lib, src, tgt, voxel_size) -> Tuple[Optional[np.ndarray], int]:
    out = np.zeros(16, np.float64)
    rc = lib.fgr_register(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(src),
        tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(tgt),
        ctypes.c_double(voxel_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return (out.reshape(4, 4) if rc == 0 else None), rc


def run_registration(
    src_points: np.ndarray, tgt_points: np.ndarray, voxel_size: float = 0.05,
    retry: bool = True,
) -> Tuple[Optional[np.ndarray], float]:
    """FGR src->tgt. Returns (4x4 float64 or None, seconds).

    Failure modes of the native pipeline (fgr.cpp rc codes): too few
    points after voxel downsampling (-1/-2) or too few reciprocal FPFH
    correspondences (-3) — sparse/degenerate clouds (round-3 fleet: the
    starvation-bug extractions). With `retry`, halve the voxel twice
    (denser downsample keeps small clouds above the 10-point floors)
    before giving up — the reference runs Open3D FGR once at 0.05
    (global_registration.py:96-116) but never saw clouds this sparse."""
    lib = _load_lib()
    if lib is None:
        return None, 0.0
    src = np.ascontiguousarray(src_points, np.float64)
    tgt = np.ascontiguousarray(tgt_points, np.float64)
    t0 = time.time()
    ladder = [voxel_size, voxel_size / 2, voxel_size / 4] if retry else [voxel_size]
    rc = 0
    for vox in ladder:
        T, rc = _fgr_once(lib, src, tgt, vox)
        if T is not None:
            return T, time.time() - t0
    if retry:
        # last rung: RANSAC needs only 3 correspondences where FGR's
        # graduated solver wants >= 10 — rescues clouds whose FPFH is too
        # ambiguous for a dense reciprocal match (tiny shells, few cells)
        for vox in (voxel_size / 2, voxel_size / 4):
            T, _dt = run_ransac_registration(src, tgt, voxel_size=vox)
            if T is not None:
                return T, time.time() - t0
    print(f"[fgr] failed (rc={rc}, n_src={len(src)}, n_tgt={len(tgt)}, "
          f"voxels tried {ladder})", flush=True)
    return None, time.time() - t0


def run_ransac_registration(
    src_points: np.ndarray,
    tgt_points: np.ndarray,
    voxel_size: float = 0.05,
    max_iters: int = 100000,
) -> Tuple[Optional[np.ndarray], float]:
    """RANSAC-based feature-matching registration (Open3D
    `registration_ransac_based_on_feature_matching` equivalent)."""
    lib = _load_lib()
    if lib is None:
        return None, 0.0
    src = np.ascontiguousarray(src_points, np.float64)
    tgt = np.ascontiguousarray(tgt_points, np.float64)
    out = np.zeros(16, np.float64)
    t0 = time.time()
    rc = lib.ransac_register(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(src),
        tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(tgt),
        ctypes.c_double(voxel_size), ctypes.c_int(max_iters),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    dt = time.time() - t0
    if rc != 0:
        return None, dt
    return out.reshape(4, 4), dt


def fpfh(points: np.ndarray, voxel_size: float = 0.05) -> Optional[np.ndarray]:
    """FPFH features of the voxel-downsampled cloud (for tests)."""
    lib = _load_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    out = np.zeros((len(pts), 33), np.float32)
    n = lib.fpfh_features(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        ctypes.c_double(voxel_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if n <= 0:
        return None
    return out[: min(n, len(pts))]

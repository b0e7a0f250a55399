"""Native (C++) host-runtime components.

The TPU compute path is JAX/XLA; the host data path around it uses this
small C++ engine for the windowing inner loop (resample + motion filter +
dir-vec conversion — the per-sample work the reference spreads over torch
DataLoader worker processes, SURVEY.md section 2.9 host boundary).

Built on demand with g++ into a cached shared library and bound via ctypes;
`available()` is False (and callers fall back to the numpy path) when no
compiler is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "window_engine.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    gxx = shutil.which("g++")
    if gxx is None or not _SRC.exists():
        return None
    tag = hashlib.md5(_SRC.read_bytes()).hexdigest()[:12]
    cache = Path(tempfile.gettempdir()) / f"ha2g_window_engine_{tag}.so"
    if not cache.exists():
        cmd = [gxx, "-O3", "-march=native", "-shared", "-fPIC",
               str(_SRC), "-o", str(cache)]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except subprocess.CalledProcessError as e:
            logging.warning("native window engine build failed: %s",
                            e.stderr.decode()[:500])
            return None
    lib = ctypes.CDLL(str(cache))
    f = lib.window_clip
    f.restype = ctypes.c_int64
    f.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_lib()
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def window_clip_native(skel: np.ndarray, duration: float, fps: int, spec,
                       mean_dir_vec: np.ndarray, mean_pose: np.ndarray,
                       n_poses: int, n_ext: int, stride: int,
                       static_joints=(6, 9), disable_filtering=False):
    """Run the native windowing engine on one clip.

    skel: (F, n_joints, 3) float32.  Returns (targets (N, n_poses, pose_dim),
    poses (N, n_poses, n_joints*3), starts (N,)).
    """
    lib = _get_lib()
    assert lib is not None, "native engine unavailable"
    skel = np.ascontiguousarray(skel, np.float32)
    n_frames, n_joints = skel.shape[0], skel.shape[1]
    parents = np.ascontiguousarray(spec.parents, np.int32)
    children = np.ascontiguousarray(spec.children, np.int32)
    mdv = np.ascontiguousarray(mean_dir_vec, np.float32).reshape(-1)
    mp = np.ascontiguousarray(mean_pose, np.float32).reshape(-1)

    max_w = max((int(duration * fps) - n_ext) // stride + 2, 1)
    targets = np.empty((max_w, n_poses, spec.n_bones * 3), np.float32)
    poses = np.empty((max_w, n_poses, n_joints * 3), np.float32)
    starts = np.empty((max_w,), np.int64)

    n = lib.window_clip(
        _fptr(skel), n_frames, n_joints, float(duration), int(fps),
        _iptr(parents), _iptr(children), spec.n_bones,
        _fptr(mdv), _fptr(mp),
        n_poses, n_ext, stride,
        int(static_joints[0]), int(static_joints[1]),
        int(disable_filtering),
        _fptr(targets), _fptr(poses),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_w)
    assert n >= 0
    return targets[:n].copy(), poses[:n].copy(), starts[:n].copy()

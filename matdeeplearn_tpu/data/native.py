"""ctypes bindings for the native C++ graph featurizer (native/featurize.cpp).

The reference spends preprocessing in python-level ase.get_all_distances +
scipy rankdata per structure (process/process.py:284-297); our native path
runs the same math in C++ with OpenMP over structures (SURVEY.md §2.3,
torch_cluster row). The shared library is built on first use with g++ into
a content-hashed cache directory, so source edits invalidate stale builds
and repeated imports are free. When no compiler is available the callers
fall back to the numpy implementation (data/graphs.py:build_graph), which
is bit-compatible by construction (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SOURCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "featurize.cpp",
)
_CACHE_ROOT = os.environ.get(
    "MATDEEPLEARN_TPU_NATIVE_CACHE",
    os.path.join(tempfile.gettempdir(), "matdeeplearn_tpu_native"),
)

_lib = None
_lib_tried = False


def _build_library() -> str | None:
    """Compile featurize.cpp → .so keyed by source hash; return the path."""
    if not os.path.exists(_SOURCE):
        return None
    with open(_SOURCE, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out_dir = os.path.join(_CACHE_ROOT, tag)
    so_path = os.path.join(out_dir, "featurize.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(out_dir, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", _SOURCE, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (OSError, subprocess.SubprocessError):
        # Retry without -march=native / OpenMP (minimal toolchains).
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SOURCE, "-o", tmp],
                check=True, capture_output=True, timeout=300,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    os.replace(tmp, so_path)
    return so_path


def get_library():
    """Load (building if needed) the native featurizer; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so_path = _build_library()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.featurize_graphs.restype = ctypes.c_int
    lib.featurize_graphs.argtypes = [
        ctypes.POINTER(ctypes.c_double),   # positions
        ctypes.POINTER(ctypes.c_double),   # cells
        ctypes.POINTER(ctypes.c_uint8),    # pbcs
        ctypes.POINTER(ctypes.c_int64),    # atom_ptr
        ctypes.c_int64,                    # n_structs
        ctypes.c_double,                   # radius
        ctypes.c_int,                      # max_neighbors
        ctypes.POINTER(ctypes.c_int32),    # edge_src out
        ctypes.POINTER(ctypes.c_int32),    # edge_dst out
        ctypes.POINTER(ctypes.c_double),   # edge_dist out
        ctypes.POINTER(ctypes.c_int64),    # edge_ptr out
    ]
    lib.featurize_abi_version.restype = ctypes.c_int
    if lib.featurize_abi_version() != 3:
        return None
    _lib = lib
    return _lib


def featurize_structures(structures, radius: float, max_neighbors: int):
    """Build (src, dst, dist) edge lists for every structure natively.

    Returns (srcs, dsts, dists) — lists of per-structure arrays in the same
    order/semantics as graphs.build_graph — or None when the native library
    is unavailable (callers fall back to numpy).
    """
    lib = get_library()
    if lib is None or not structures:
        return None

    n_structs = len(structures)
    atom_counts = np.array([len(s) for s in structures], np.int64)
    atom_ptr = np.concatenate([[0], np.cumsum(atom_counts)]).astype(np.int64)
    total_atoms = int(atom_ptr[-1])

    positions = np.ascontiguousarray(
        np.concatenate([s.positions for s in structures]), np.float64
    )
    cells = np.ascontiguousarray(
        np.stack([s.cell for s in structures]).reshape(n_structs, 9), np.float64
    )
    pbcs = np.ascontiguousarray(
        np.stack([s.pbc for s in structures]).reshape(n_structs, 3), np.uint8
    )

    cap = total_atoms * (max_neighbors + 2)
    edge_src = np.zeros(cap, np.int32)
    edge_dst = np.zeros(cap, np.int32)
    edge_dist = np.zeros(cap, np.float64)
    edge_ptr = np.zeros(n_structs + 1, np.int64)

    rc = lib.featurize_graphs(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pbcs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        atom_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n_structs),
        ctypes.c_double(radius),
        ctypes.c_int(max_neighbors),
        edge_src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        edge_dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        edge_dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        edge_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None

    srcs, dsts, dists = [], [], []
    for s in range(n_structs):
        a, b = edge_ptr[s], edge_ptr[s + 1]
        srcs.append(edge_src[a:b].copy())
        dsts.append(edge_dst[a:b].copy())
        dists.append(edge_dist[a:b].copy())
    return srcs, dsts, dists

"""Native (C++) runtime components, built on demand with g++.

The shared library is compiled once into native/_build/ and cached;
rebuilds trigger on source mtime changes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")


def _build_lib(name: str, sources: list[str]) -> str:
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, f"lib{name}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
    ):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", out, *srcs]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load_tsdf_lib() -> ctypes.CDLL:
    path = _build_lib("tsdf_fusion", ["tsdf_fusion.cpp"])
    lib = ctypes.CDLL(path)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.tsdf_create.restype = ctypes.c_void_p
    lib.tsdf_create.argtypes = [ctypes.c_float, ctypes.c_float]
    lib.tsdf_destroy.argtypes = [ctypes.c_void_p]
    lib.tsdf_num_blocks.restype = ctypes.c_int64
    lib.tsdf_num_blocks.argtypes = [ctypes.c_void_p]
    lib.tsdf_integrate.argtypes = [
        ctypes.c_void_p, f32p, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_float,
    ]
    lib.tsdf_extract_mesh.restype = ctypes.c_void_p
    lib.tsdf_extract_mesh.argtypes = [ctypes.c_void_p, ctypes.c_float]
    lib.mesh_num_vertices.restype = ctypes.c_int64
    lib.mesh_num_vertices.argtypes = [ctypes.c_void_p]
    lib.mesh_num_triangles.restype = ctypes.c_int64
    lib.mesh_num_triangles.argtypes = [ctypes.c_void_p]
    lib.mesh_copy.argtypes = [ctypes.c_void_p, f32p, i32p]
    lib.mesh_destroy.argtypes = [ctypes.c_void_p]
    return lib

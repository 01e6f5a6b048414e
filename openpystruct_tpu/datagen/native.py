"""ctypes bindings for the native dataset writer.

The shared library is compiled on demand from ``native/dataset_writer.cpp``
(g++ is part of the environment; pybind11 is not, hence plain-C ABI +
ctypes).  The build is cached next to the source and keyed on its content
hash; if no toolchain is available, callers fall back to the Python writer.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "dataset_writer.cpp",
)

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        build_dir = os.path.join(os.path.dirname(_SRC), "build")
        os.makedirs(build_dir, exist_ok=True)
        so_path = os.path.join(build_dir, f"libopsio-{digest}.so")
        if not os.path.exists(so_path):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 _SRC, "-o", so_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.opsio_write_json_dataset.restype = ctypes.c_int
        lib.opsio_write_json_dataset.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _lib = lib
        return lib
    except (OSError, subprocess.CalledProcessError):
        _lib_failed = True
        return None


def native_available() -> bool:
    return _build_and_load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def write_json_dataset_native(batch_or_fields, path: str,
                              num_threads: int = 0) -> int:
    """Serialize a DatagenBatch (or a fields dict with keys node_x, roller,
    loads, I, shear, moment, defl, rot, valid) straight to the reference
    JSON schema.  Returns the number of (valid) samples written; raises
    RuntimeError if the native library is unavailable.
    """
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native dataset writer unavailable (no g++?)")

    if isinstance(batch_or_fields, dict):
        fields = batch_or_fields
    else:
        b = batch_or_fields
        fields = dict(
            node_x=b.scenario.node_x,
            roller=b.scenario.roller_mask,
            loads=b.scenario.point_loads,
            I=b.result.I,
            shear=b.result.solution.shear_forces,
            moment=b.result.solution.bending_moments,
            defl=b.result.solution.deflections,
            rot=b.result.solution.rotations,
            valid=b.valid,
        )

    def f32(x):
        return np.ascontiguousarray(np.asarray(x), dtype=np.float32)

    node_x = f32(fields["node_x"])
    B, n = node_x.shape
    roller = np.ascontiguousarray(np.asarray(fields["roller"]), np.uint8)
    loads = f32(fields["loads"])
    I = f32(fields["I"])
    shear = f32(fields["shear"])
    moment = f32(fields["moment"])
    defl = f32(fields["defl"])
    rot = f32(fields["rot"])
    valid = np.ascontiguousarray(np.asarray(fields["valid"]), np.uint8)

    written = lib.opsio_write_json_dataset(
        path.encode(), B, n, _fptr(node_x), _u8ptr(roller), _fptr(loads),
        _fptr(I), _fptr(shear), _fptr(moment), _fptr(defl), _fptr(rot),
        _u8ptr(valid), num_threads,
    )
    if written < 0:
        raise RuntimeError(f"native writer failed with code {written}")
    return written

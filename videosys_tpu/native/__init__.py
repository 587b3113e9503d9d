"""Native input-pipeline runtime: GIL-free threaded file reads via ctypes.

`vsl_loader.cpp` is compiled on first use with the toolchain g++ (no
pybind11 in the image; plain C ABI + ctypes). Everything degrades
gracefully: `available()` is False when no compiler/ABI is usable and
callers fall back to numpy IO.

The reference gets this for free from torch's native DataLoader workers
(training/datasets/open_sora/dataloader.py); under single-process SPMD the
equivalent is a native thread pool overlapping sample IO with device steps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "vsl_loader.cpp")
_LIB_PATH = os.path.join(_HERE, "_build", "libvsl.so")

_lib = None
_lib_err: Optional[str] = None
_lock = threading.Lock()


def _compile() -> str:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    tmp = _LIB_PATH + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(tmp, _LIB_PATH)  # atomic: concurrent builders both succeed
    return _LIB_PATH


def _load():
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.vsl_create.restype = ctypes.c_void_p
            lib.vsl_create.argtypes = [ctypes.c_int]
            lib.vsl_submit.restype = ctypes.c_long
            lib.vsl_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_long, ctypes.c_long,
                                       ctypes.c_void_p]
            lib.vsl_wait.restype = ctypes.c_int
            lib.vsl_wait.argtypes = [ctypes.c_void_p, ctypes.c_long]
            lib.vsl_inflight.restype = ctypes.c_long
            lib.vsl_inflight.argtypes = [ctypes.c_void_p]
            lib.vsl_destroy.restype = None
            lib.vsl_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # no g++ / unwritable dir / bad ABI
            _lib_err = f"{type(e).__name__}: {e}"
        return _lib


def available() -> bool:
    """True when the native reader compiled and loaded on this host."""
    return _load() is not None


def why_unavailable() -> Optional[str]:
    _load()
    return _lib_err


class NativeReadPool:
    """Thread-pool positioned reads into caller-owned numpy buffers.

    submit() returns a job id immediately; the read runs on a C++ thread
    with no interpreter involvement. wait() blocks until that read landed
    in `dst` and raises OSError on IO failure. One wait per job."""

    def __init__(self, threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native reader unavailable: {_lib_err}")
        self._lib = lib
        self._pool = lib.vsl_create(int(threads))
        if not self._pool:
            raise MemoryError("vsl_create failed")
        # keep submitted dst arrays alive until their wait() completes
        self._pins: Dict[int, np.ndarray] = {}
        self._mu = threading.Lock()

    def submit(self, path: str, dst: np.ndarray, offset: int = 0,
               nbytes: Optional[int] = None) -> int:
        assert dst.flags["C_CONTIGUOUS"] and dst.flags["WRITEABLE"]
        n = dst.nbytes if nbytes is None else int(nbytes)
        job = self._lib.vsl_submit(
            self._pool, os.fsencode(path), int(offset), n,
            dst.ctypes.data_as(ctypes.c_void_p))
        if job < 0:
            raise MemoryError("vsl_submit failed")
        with self._mu:
            self._pins[job] = dst
        return int(job)

    def wait(self, job: int) -> None:
        rc = self._lib.vsl_wait(self._pool, int(job))
        with self._mu:
            known = self._pins.pop(job, None) is not None
        if rc == -22 and not known:  # -EINVAL from an id we never pinned
            raise KeyError(f"unknown or already-waited job {job}")
        if rc < 0:
            raise OSError(-rc, os.strerror(-rc), None)

    def inflight(self) -> int:
        return int(self._lib.vsl_inflight(self._pool))

    def close(self) -> None:
        if getattr(self, "_pool", None):
            self._lib.vsl_destroy(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover - interpreter teardown ordering
        try:
            self.close()
        except Exception:
            pass


def npy_header(path: str) -> Tuple[Tuple[int, ...], np.dtype, int]:
    """Parse a .npy header host-side: (shape, dtype, payload_offset).
    The payload is then a plain positioned read for NativeReadPool (C-order,
    no pickle). Rejects Fortran-order and object arrays."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        if version == (1, 0):
            shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
        else:
            shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
        if fortran or dtype.hasobject:
            raise ValueError(f"{path}: unsupported npy layout for raw reads")
        return shape, dtype, f.tell()

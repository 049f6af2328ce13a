"""
Native (C++) host kernels, loaded through ctypes.

The reference pipeline's hot host loops live in a C extension
(furry_parakeet); this package is the equivalent for the loops that still
run on the host here: the D5512/G4460 scattered-point interpolators (PSF
sample batching feeds the device overlap spectra) and the destriping
bilinear gather/adjoint pair.  See kernels.cpp for the contracts.

The shared object builds on first use with the system g++ (no build step,
no pybind11) into a content-addressed cache, so editing kernels.cpp
invalidates stale binaries automatically.  Everything degrades gracefully:
``available()`` is False when there is no compiler or the build fails, and
every caller falls back to its numpy twin.  ``PYIMCOM_NATIVE=0`` disables
the native path outright.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess

import numpy as np

_SRC = pathlib.Path(__file__).with_name("kernels.cpp")
_lib = None
_tried = False

_I64 = ctypes.c_int64
_PD = np.ctypeslib.ndpointer(dtype=np.float64, flags=("C", "ALIGNED"))


def _cache_dir() -> pathlib.Path:
    d = os.environ.get("PYIMCOM_NATIVE_CACHE")
    if d:
        return pathlib.Path(d)
    return pathlib.Path(os.environ.get("XDG_CACHE_HOME",
                                       pathlib.Path.home() / ".cache")) \
        / "pyimcom_tpu"


def _build() -> ctypes.CDLL | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = _cache_dir()
    so = cache / f"kernels_{tag}.so"
    if not so.exists():
        cache.mkdir(parents=True, exist_ok=True)
        tmp = so.with_suffix(f".tmp{os.getpid()}.so")
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", str(tmp), str(_SRC)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
        os.replace(tmp, so)  # atomic: concurrent builders race safely
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    lib.pimc_interp2d_multi.restype = ctypes.c_int
    lib.pimc_interp2d_multi.argtypes = [
        _PD, _I64, _I64, _I64, _PD, _PD, _I64, ctypes.c_int, _PD]
    lib.pimc_bilinear_gather.restype = ctypes.c_int
    lib.pimc_bilinear_gather.argtypes = [
        _PD, _I64, _I64, _PD, _PD, _I64, ctypes.c_void_p, _PD]
    lib.pimc_bilinear_scatter_adjoint.restype = ctypes.c_int
    lib.pimc_bilinear_scatter_adjoint.argtypes = [
        _PD, _PD, _PD, _I64, _I64, _I64, _PD]
    return lib


def _get() -> ctypes.CDLL | None:
    global _lib, _tried
    if not _tried:
        _tried = True
        if os.environ.get("PYIMCOM_NATIVE", "1") != "0":
            _lib = _build()
    return _lib


def available() -> bool:
    """True when the native kernels compiled and loaded on this host."""
    return _get() is not None


_KERN_ID = {"D5512": 0, "G4460": 1}


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64)


def interp2d_multi(images, x, y, kern: str = "D5512") -> np.ndarray:
    """
    Native twin of ops.interp.interp2d_multi / interp2d_np: interpolate
    (L, ny, nx) layers at (n,) scattered points -> (L, n).  Raises
    RuntimeError when the library is unavailable (callers gate on
    :func:`available`).
    """
    lib = _get()
    if lib is None:
        raise RuntimeError("native kernels unavailable")
    images = _c64(images)
    if images.ndim == 2:
        images = images[None]
    x = _c64(x)
    y = _c64(y)
    L, ny, nx = images.shape
    out = np.empty((L, len(x)), dtype=np.float64)
    lib.pimc_interp2d_multi(images, L, ny, nx, x, y, len(x),
                            _KERN_ID[kern], out)
    return out


def bilinear_gather(image, xf, yf, g_eff=None) -> np.ndarray:
    """Native twin of imdestripe._bilinear_gather_np."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native kernels unavailable")
    image = _c64(image)
    shape = np.shape(xf)
    xf = _c64(xf).ravel()
    yf = _c64(yf).ravel()
    ny, nx = image.shape
    out = np.empty(xf.size, dtype=np.float64)
    g = None if g_eff is None else _c64(g_eff)
    gp = None if g is None else g.ctypes.data_as(ctypes.c_void_p)
    lib.pimc_bilinear_gather(image, ny, nx, xf, yf, xf.size, gp, out)
    return out.reshape(shape)


def bilinear_scatter_adjoint(values, xf, yf, shape) -> np.ndarray:
    """Native twin of imdestripe.bilinear_scatter_adjoint (host path)."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native kernels unavailable")
    out = np.zeros(tuple(shape), dtype=np.float64)
    values = _c64(values).ravel()
    xf = _c64(xf).ravel()
    yf = _c64(yf).ravel()
    lib.pimc_bilinear_scatter_adjoint(values, xf, yf, values.size,
                                      shape[0], shape[1], out)
    return out

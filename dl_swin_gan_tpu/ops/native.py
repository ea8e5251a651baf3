"""ctypes loader for the native (C) input-pipeline kernels.

The VDkt mask generator is the one inherently sequential per-example hot
path on the host (data-dependent Cartesian grid fitting) — `native/vdkt.c`
implements it with a bit-exact reimplementation of numpy's legacy
RandomState (MT19937). The shared library is compiled on demand with the
system compiler and cached; every caller falls back to the pure-Python path
if compilation or loading fails (set DL_SWIN_GAN_NO_NATIVE=1 to force the
fallback).
"""

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence, Tuple, Union

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "vdkt.c")
_LIB = None
_TRIED = False


def _build_lib() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    cache = os.path.join(_REPO_ROOT, "native", "build")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "libvdkt.so")
    if (os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        return so_path
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run([cc, "-O2", "-shared", "-fPIC", "-o", so_path,
                            _SRC, "-lm"], check=True, capture_output=True)
            logger.info("built native vdkt library with %s -> %s", cc, so_path)
            return so_path
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return None


def get_vdkt_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("DL_SWIN_GAN_NO_NATIVE") == "1":
        return None
    try:
        so_path = _build_lib()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        lib.vdkt_mask.restype = ctypes.c_double
        lib.vdkt_mask.argtypes = [
            ctypes.POINTER(ctypes.c_float),                       # out
            ctypes.c_long, ctypes.c_long, ctypes.c_long,          # nkx,nky,nph
            ctypes.c_double, ctypes.c_double,                     # accel range
            ctypes.c_double, ctypes.c_double,                     # partial kx/ky
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_long,       # seed key
            ctypes.c_int,                                         # scalar_seed
        ]
        _LIB = lib
    except Exception as e:  # pragma: no cover
        logger.warning("native vdkt unavailable (%s); using Python path", e)
        _LIB = None
    return _LIB


def _seed_key(seed: Union[int, Sequence[int], None]
              ) -> Tuple[np.ndarray, bool]:
    """Replicate numpy legacy RandomState seeding semantics."""
    if seed is None:
        # non-deterministic, like rng.seed(None)
        return np.random.randint(0, 2 ** 32, size=2, dtype=np.uint32), False
    if isinstance(seed, (int, np.integer)):
        if int(seed) < 0:
            # numpy RandomState raises; silently seeding from an empty key
            # would make the native path diverge from the Python path
            raise ValueError("Seed must be between 0 and 2**32 - 1")
        if int(seed) < 2 ** 32:
            return np.array([seed], dtype=np.uint32), True
        # large ints fall back to array seeding like numpy
        v, out = int(seed), []
        while v > 0:
            out.append(v & 0xFFFFFFFF)
            v >>= 32
        return np.array(out, dtype=np.uint32), False
    return np.asarray(list(seed), dtype=np.uint32), False


def vdkt_mask_native(nkx: int, nky: int, nphases: int,
                     accelerations: Sequence[float],
                     sim_partial_kx: float, sim_partial_ky: float,
                     seed) -> Optional[np.ndarray]:
    """Full VDktMaskFunc.__call__ on the native path; None if unavailable.

    Returns float32 [nphases, nky, nkx].
    """
    lib = get_vdkt_lib()
    if lib is None:
        return None
    key, scalar = _seed_key(seed)
    out = np.empty((nphases, nky, nkx), np.float32)
    accel = lib.vdkt_mask(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nkx, nky, nphases,
        float(accelerations[0]), float(accelerations[1]),
        float(sim_partial_kx), float(sim_partial_ky),
        key.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(key),
        int(scalar),
    )
    if accel < 0:
        # the grid-fitting edge walk left [0, ny) past the one-step numpy
        # wrap — the Python/reference path raises IndexError on the same
        # inputs (subsample.py:170); match it rather than corrupt memory
        raise IndexError(
            f"vdkt edge walk out of bounds (nky={nky}, nphases={nphases})")
    return out

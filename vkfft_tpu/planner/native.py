"""ctypes binding to the native C++ planner core.

Loads ``vkfft_tpu/native/libplanner_core.so`` when present (``make -C
vkfft_tpu/native``).  Auto-building on first use is opt-in via
``VKFFT_TPU_NATIVE_BUILD=1`` (a compile writing into the package directory is
too surprising as an import side effect; sandboxed or compiler-less
environments would pay a failed-subprocess penalty).  Every entry point has a
pure-Python fallback in ``factorize.py``, and tests assert bit-identical
parity between the two.  Disable entirely with ``VKFFT_TPU_NATIVE=0``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO = os.path.join(_DIR, "libplanner_core.so")

_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _try_build() -> None:
    """Build the native planner (at most once per process)."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True, capture_output=True,
                       timeout=120)
    except Exception:
        pass


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("VKFFT_TPU_NATIVE", "1") == "0":
        return None
    if (not os.path.exists(_SO)
            and os.environ.get("VKFFT_TPU_NATIVE_BUILD", "0") == "1"):
        _try_build()
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64 = ctypes.c_int64
    p64 = ctypes.POINTER(ctypes.c_int64)
    lib.vt_prime_factors.restype = i64
    lib.vt_prime_factors.argtypes = [i64, p64, i64]
    lib.vt_is_prime.restype = ctypes.c_int32
    lib.vt_is_prime.argtypes = [i64]
    lib.vt_next_smooth.restype = i64
    lib.vt_next_smooth.argtypes = [i64]
    lib.vt_group_radices.restype = i64
    lib.vt_group_radices.argtypes = [p64, i64, i64, p64, i64]
    lib.vt_primitive_root.restype = i64
    lib.vt_primitive_root.argtypes = [i64]
    lib.vt_bluestein_size.restype = i64
    lib.vt_bluestein_size.argtypes = [i64, i64, i64]
    if hasattr(lib, "vt_decompose"):  # absent in pre-round-2 builds
        lib.vt_decompose.restype = i64
        lib.vt_decompose.argtypes = [i64, ctypes.c_int32, i64, i64, i64, p64, i64]
    _lib = lib
    return _lib


def prime_factors(n: int) -> Optional[list[int]]:
    lib = get_lib()
    if lib is None:
        return None
    buf = (ctypes.c_int64 * 64)()
    cnt = lib.vt_prime_factors(n, buf, 64)
    if cnt < 0:
        return None
    return [int(buf[i]) for i in range(cnt)]


def is_prime(n: int) -> Optional[bool]:
    lib = get_lib()
    if lib is None:
        return None
    return bool(lib.vt_is_prime(n))


def next_smooth(n: int) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.vt_next_smooth(n))


def group_radices(primes: list[int], max_radix: int) -> Optional[list[int]]:
    lib = get_lib()
    if lib is None:
        return None
    arr = (ctypes.c_int64 * max(1, len(primes)))(*primes)
    out = (ctypes.c_int64 * 64)()
    cnt = lib.vt_group_radices(arr, len(primes), max_radix, out, 64)
    if cnt < 0:
        return None
    return [int(out[i]) for i in range(cnt)]


def primitive_root(p: int) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    g = lib.vt_primitive_root(p)
    return int(g) if g > 0 else None


def bluestein_size(n: int, max_direct_prime: int, group_radix: int) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    m = lib.vt_bluestein_size(n, max_direct_prime, group_radix)
    return int(m) if m > 0 else None


def decompose(n: int, allow_rader: bool, max_direct_prime: int,
              group_radix: int, rader_max_prime: int
              ) -> Optional[tuple[int, int, int, list[int]]]:
    """Full decomposition cascade (``vt_decompose``).  Returns
    ``(algo, aux1, aux2, radices)`` with algo 0=DIRECT 1=RADER 2=BLUESTEIN
    3=SPLIT, or None when the native core is unavailable/too old."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "vt_decompose"):
        return None
    out = (ctypes.c_int64 * 96)()
    rc = lib.vt_decompose(n, 1 if allow_rader else 0, max_direct_prime,
                          group_radix, rader_max_prime, out, 96)
    if rc < 4:
        return None
    nrad = int(out[3])
    return (int(out[0]), int(out[1]), int(out[2]),
            [int(out[4 + i]) for i in range(nrad)])

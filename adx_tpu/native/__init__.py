"""Native (C) host kernels, built on first use with the system toolchain.

The TPU compute path is jax/XLA; these kernels cover the *host* side of
the framework where the reference leans on compiled libraries (librosa's
numba-jitted pyin Viterbi — reference src/feature_extraction.py:11-13).
The image has no pybind11, so bindings go through ctypes against a thin
C ABI; sources are compiled with g++ into a cache directory keyed by a
source hash, and every entry point degrades gracefully to the pure-numpy
implementation when no toolchain is available.
"""

from __future__ import annotations

import contextlib
import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_SRC_DIR = Path(__file__).resolve().parent
_CACHE_DIR = Path(
    os.environ.get(
        "ADX_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "adx_tpu_native"),
    )
)

_lib_cache: dict = {}
_arch_tag: Optional[bytes] = None


def _native_arch_tag() -> bytes:
    """Hashable fingerprint of what ``-march=native`` compiles to here."""
    global _arch_tag
    if _arch_tag is None:
        try:
            out = subprocess.run(
                ["g++", "-march=native", "-dM", "-E", "-x", "c++", "-"],
                stdin=subprocess.DEVNULL, capture_output=True, timeout=30,
            ).stdout
            _arch_tag = hashlib.sha256(out).hexdigest()[:16].encode()
        except Exception:
            import platform

            _arch_tag = platform.machine().encode() or b"unknown"
    return _arch_tag


def _build_shared(src_name: str) -> Optional[ctypes.CDLL]:
    """Compile ``src_name`` (in this directory) to a cached .so and load it.

    Returns None (and remembers the failure) when no compiler is present or
    compilation fails — callers fall back to their numpy paths.
    """
    if src_name in _lib_cache:
        return _lib_cache[src_name]
    lib = None
    try:
        src = _SRC_DIR / src_name
        code = src.read_bytes()
        # key by the compiler's resolved -march=native ISA too: a binary
        # built on one machine would SIGILL on a weaker one sharing the
        # cache dir (e.g. NFS homes); the -dM macro dump captures every
        # ISA define (AVX level etc.), unlike platform.machine()
        arch = _native_arch_tag()
        tag = hashlib.sha256(code + b"\0" + arch).hexdigest()[:16]
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        so_path = _CACHE_DIR / f"{src.stem}-{tag}.so"
        if not so_path.exists():
            # strict IEEE (no -ffast-math): the kernels are kept bit-exact
            # to their numpy twins, which reordering would break
            with tempfile.NamedTemporaryFile(
                suffix=".so", dir=_CACHE_DIR, delete=False
            ) as tmp:
                tmp_path = tmp.name
            try:
                cmd = [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-o", tmp_path, str(src),
                ]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(tmp_path, so_path)  # atomic vs concurrent builders
            except BaseException:
                # don't leave an orphan temp .so per failed-compile process
                with contextlib.suppress(OSError):
                    os.unlink(tmp_path)
                raise
        lib = ctypes.CDLL(str(so_path))
    except Exception:
        lib = None
    _lib_cache[src_name] = lib
    return lib


def pyin_viterbi_native(
    log_obs_v: np.ndarray,
    log_obs_u: np.ndarray,
    log_tri: np.ndarray,
    K: int,
    log_stay: float,
    log_switch: float,
    delta_init: np.ndarray,
    rn: Optional[np.ndarray] = None,
):
    """Banded two-row pYIN Viterbi via the C kernel.

    Mirrors (bit-exactly) the numpy loop in ``features/pyin.py``; see
    ``native/pyin_viterbi.c``. Returns ``(states int32 [T], voiced bool [T])``
    or ``None`` when the native library is unavailable or the problem falls
    outside the kernel's envelope (backpointer slots are uint8: 2K <= 255).
    """
    if 2 * K > 255:
        return None
    lib = _build_shared("pyin_viterbi.c")
    if lib is None:
        return None
    fn = lib.pyin_viterbi
    fn.restype = ctypes.c_int
    T, M = log_obs_v.shape
    log_obs_v = np.ascontiguousarray(log_obs_v, dtype=np.float64)
    # the unvoiced observation is constant per frame ([T, 1] upstream) —
    # the kernel takes the [T] column directly (a [T, M] broadcast copy
    # allocated ~50 MB per 120 s call for values the loop reads once/frame)
    log_obs_u = np.ascontiguousarray(
        np.reshape(np.broadcast_to(log_obs_u, (T, 1)), (T,)), dtype=np.float64
    )
    log_tri = np.ascontiguousarray(log_tri, dtype=np.float32)
    delta_init = np.ascontiguousarray(delta_init, dtype=np.float32)
    assert delta_init.shape == (2, M)
    assert log_tri.shape == (2 * K + 1,)
    states = np.empty(T, dtype=np.int32)
    voiced = np.empty(T, dtype=np.uint8)
    p = ctypes.POINTER
    rc = fn(
        log_obs_v.ctypes.data_as(p(ctypes.c_double)),
        log_obs_u.ctypes.data_as(p(ctypes.c_double)),
        ctypes.c_int64(T),
        ctypes.c_int64(M),
        log_tri.ctypes.data_as(p(ctypes.c_float)),
        ctypes.c_int64(K),
        ctypes.c_double(log_stay),
        ctypes.c_double(log_switch),
        (None if rn is None else
         np.ascontiguousarray(rn, dtype=np.float32).ctypes.data_as(
             p(ctypes.c_float))),
        delta_init.ctypes.data_as(p(ctypes.c_float)),
        states.ctypes.data_as(p(ctypes.c_int32)),
        voiced.ctypes.data_as(p(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return states, voiced.astype(bool)

"""ctypes bindings for the native audio I/O library (native/audioio.cpp).

Multithreaded WAV decode + polyphase resample for dataset preparation. The
library builds on demand with ``make`` (g++ only, no external deps); every
entry point falls back to the pure-Python path in :mod:`..ops.audio_io` when
the toolchain or library is unavailable, so the framework never hard-requires
the native build.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger("audio_diffusion_tpu.native")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libadtaudio.so"))
_lib = None
_tried = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           capture_output=True, check=True, timeout=120)
        except Exception as e:
            logger.info("native audio library unavailable (%s); using Python fallback", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.info("failed to load %s: %s", _LIB_PATH, e)
        return None

    lib.adt_load_wav.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                 ctypes.POINTER(ctypes.c_int64)]
    lib.adt_load_wav.restype = ctypes.c_int
    lib.adt_load_batch.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                                   ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                   ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.adt_load_batch.restype = ctypes.c_int
    lib.adt_resample.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                                 ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                 ctypes.POINTER(ctypes.c_int64)]
    lib.adt_resample.restype = ctypes.c_int
    lib.adt_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load_library() is not None


def _take(lib, ptr, n: int) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.adt_free(ptr)
    return arr


def load_wav(path: str, target_sr: int) -> Optional[np.ndarray]:
    """Decode one WAV to mono float32 at target_sr, or None if unavailable/failed."""
    lib = _load_library()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    if lib.adt_load_wav(path.encode(), target_sr, ctypes.byref(out), ctypes.byref(n)) != 0:
        return None
    return _take(lib, out, n.value)


def load_batch(paths: Sequence[str], target_sr: int, n_threads: int = 0) -> List[Optional[np.ndarray]]:
    """Decode many WAVs in parallel; None entries mark failed files."""
    lib = _load_library()
    if lib is None:
        return [load_wav(p, target_sr) for p in paths]
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    lens = (ctypes.c_int64 * n)()
    lib.adt_load_batch(c_paths, n, target_sr, outs, lens, n_threads)
    result: List[Optional[np.ndarray]] = []
    for i in range(n):
        if lens[i] < 0 or not outs[i]:
            result.append(None)
        else:
            result.append(_take(lib, outs[i], lens[i]))
    return result


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> Optional[np.ndarray]:
    lib = _load_library()
    if lib is None or orig_sr == target_sr:
        return None if lib is None else np.asarray(audio, dtype=np.float32)
    g = int(np.gcd(orig_sr, target_sr))
    x = np.ascontiguousarray(audio, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.adt_resample(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
                          target_sr // g, orig_sr // g, ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        return None
    return _take(lib, out, n.value)

"""ctypes binding for the native loader core (native/loader.cc).

`load_letterbox_batch(paths, img_size)` decodes + letterboxes a whole batch
in one C++ call with a thread pool — the host-runtime replacement for the
reference's per-image cv2 round trips. Builds the .so on first use if the
toolchain is present; falls back to the Python path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_ROOT = Path(__file__).resolve().parents[2]
_SO = _ROOT / "native" / "libysl_loader.so"
_lib = None
_checked = False


def _load_lib():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if not _SO.exists():
        script = _ROOT / "tools" / "build_native.sh"
        try:
            subprocess.run(["bash", str(script)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.ysl_load_letterbox_batch.restype = ctypes.c_int
        lib.ysl_load_letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_letterbox_batch(paths: Sequence[str], img_size: int,
                         scaleup: bool = False, n_threads: int = 4):
    """Returns (images (n, s, s, 3) uint8 RGB, metas (n, 6)
    [ratio, dw, dh, h0, w0, ok]) — or None if the native lib is missing."""
    lib = _load_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, img_size, img_size, 3), np.uint8)
    metas = np.empty((n, 6), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.ysl_load_letterbox_batch(
        arr, n, img_size, int(scaleup),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        metas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads)
    return out, metas

"""ctypes bridge to the native multithreaded scene loader (native/scene_loader.cpp).

Falls back to None when the shared library hasn't been built (``make -C
native``); SceneDataset then decodes serially with cv2.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, "..", "..", "native", "libhmnffb_loader.so"),
        os.environ.get("HMNFFB_LOADER_SO", ""),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            try:
                lib = ctypes.CDLL(c)
                lib.hmnffb_load_scene.restype = ctypes.c_int
                lib.hmnffb_load_scene.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int,
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def load_scene_native(
    image_paths: List[str], mask_paths: List[str], img_res: Tuple[int, int],
    n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Returns (rgb (V, H*W, 3) uint8, mask (V, H*W) bool) or None."""
    lib = _find_lib()
    if lib is None or len(image_paths) != len(mask_paths) or not image_paths:
        return None
    H, W = img_res
    V = len(image_paths)
    rgb = np.empty((V, H * W, 3), dtype=np.uint8)
    mask = np.empty((V, H * W), dtype=np.uint8)

    img_arr = (ctypes.c_char_p * V)(*[p.encode() for p in image_paths])
    msk_arr = (ctypes.c_char_p * V)(*[p.encode() for p in mask_paths])
    rc = lib.hmnffb_load_scene(
        img_arr, msk_arr, V, H, W,
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
    )
    if rc != 0:
        return None
    return rgb, mask.astype(bool)

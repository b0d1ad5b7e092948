"""ctypes bindings for the native image loader (native/ttdata.cpp) —
the DALI-pipeline equivalent (utils/preprocess.py:129-219 in the
reference, dead code there).  Falls back to the PIL path when libjpeg or
the toolchain is unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ttdata.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_ttdata.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                    os.path.exists(_SRC)
                    and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _SO, "-ljpeg"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.ttdata_load_eval_batch.restype = ctypes.c_int
            lib.ttdata_load_eval_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_data_available() -> bool:
    return _load() is not None


def load_eval_batch(paths: list[str], crop: int = 224,
                    resize_to: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """Decode+resize+crop+normalize a batch of JPEGs natively.
    Returns (images (n, crop, crop, 3) f32, fail_mask (n,) uint8)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ttdata unavailable")
    n = len(paths)
    out = np.zeros((n, crop, crop, 3), np.float32)
    fail = np.zeros(n, np.uint8)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    mean = np.ascontiguousarray(IMAGENET_MEAN, np.float32)
    std = np.ascontiguousarray(IMAGENET_STD, np.float32)
    lib.ttdata_load_eval_batch(
        blob, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        crop, resize_to,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, fail


class NativeImageFolder:
    """ImageFolder with the native decode path (eval transform baked in).
    Same (image, label) contract as data.ImageFolder."""

    def __init__(self, root: str, crop: int = 224, resize_to: int = 256):
        from ..data.dataset import ImageFolder

        base = ImageFolder(root, transform=None)
        self.samples = base.samples
        self.classes = base.classes
        self.crop, self.resize_to = crop, resize_to

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        imgs, fail = load_eval_batch([path], self.crop, self.resize_to)
        if fail[0]:
            raise IOError(f"native decode failed: {path}")
        return imgs[0], label

"""ctypes wrapper around the native prefetching dataset reader
(native/hso_io.cpp) with transparent fallback to the pure-Python
:class:`hso_tpu.io.image_reader.ImageReader` when the library isn't built.

Build with ``native/build.sh``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "native", "build",
    "libhso_io.so",
)


def _load_lib():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.hso_reader_open.restype = ctypes.c_void_p
    lib.hso_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.hso_reader_count.argtypes = [ctypes.c_void_p]
    lib.hso_reader_count.restype = ctypes.c_int
    lib.hso_reader_path.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hso_reader_path.restype = ctypes.c_char_p
    lib.hso_reader_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)
    ]
    lib.hso_reader_read.restype = ctypes.c_int
    lib.hso_reader_start.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 4
    lib.hso_reader_start.restype = ctypes.c_int
    lib.hso_reader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.hso_reader_next.restype = ctypes.c_int
    lib.hso_reader_close.argtypes = [ctypes.c_void_p]
    return lib


_LIB = _load_lib()


def native_available() -> bool:
    return _LIB is not None


class NativeImageReader:
    """Sequential prefetching reader over a dataset directory."""

    def __init__(self, folder: str, size_wh: tuple[int, int],
                 n_workers: int = 3, depth: int = 8):
        if _LIB is None:
            raise RuntimeError("libhso_io.so not built (run native/build.sh)")
        self._lib = _LIB
        self._h = _LIB.hso_reader_open(
            folder.encode(), int(size_wh[0]), int(size_wh[1])
        )
        if not self._h:
            raise IOError(f"cannot open {folder}")
        self.size_wh = size_wh
        self.n_workers = n_workers
        self.depth = depth
        self._buf = np.empty((size_wh[1], size_wh[0]), np.uint8)

    def __len__(self) -> int:
        return self._lib.hso_reader_count(self._h)

    def path(self, i: int) -> str:
        return self._lib.hso_reader_path(self._h, i).decode()

    def read_image(self, i: int) -> np.ndarray:
        rc = self._lib.hso_reader_read(
            self._h, i, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc != 0:
            raise IOError(f"decode failed for index {i} (rc={rc})")
        return self._buf.copy()

    def start(self, start: int = 0, end: int | None = None) -> None:
        end = len(self) if end is None else end
        self._lib.hso_reader_start(self._h, start, end, self.n_workers, self.depth)

    def __iter__(self):
        while True:
            idx = self._lib.hso_reader_next(
                self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            )
            if idx < 0:
                return
            yield idx, self._buf.copy()

    def close(self) -> None:
        if self._h:
            self._lib.hso_reader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

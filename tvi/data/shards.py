"""Binary training shards + the native loader's Python surface.

``write_shard``/``pack_dataset`` serialize videos into the fixed-geometry
uint8 shard format consumed by native/tvi_loader.cpp (header: magic 'TVIS',
u32 version=1, u32 records, u32 frames, u32 height, u32 width; then raw
frame-major uint8 RGB records).  ``NativeFrameLoader`` is the ctypes
binding with background-thread prefetch; ``ensure_native_lib`` compiles the
.so on first use with g++ (graceful: callers fall back to the Python
dataset when no toolchain is present)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

_MAGIC = b"TVIS"
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "tvi_loader.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libtvi_loader.so")


def write_shard(path: str, videos: np.ndarray):
    """videos: (N, F, H, W, 3) uint8."""
    assert videos.dtype == np.uint8 and videos.ndim == 5 and videos.shape[-1] == 3
    n, f, h, w, _ = videos.shape
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(np.asarray([1, n, f, h, w], np.uint32).tobytes())
        fh.write(np.ascontiguousarray(videos).tobytes())


def pack_dataset(dataset, out_dir: str, records_per_shard: int = 64,
                 max_records: Optional[int] = None) -> List[str]:
    """Pack a FrameInterpolationDataset into shards (each record is the
    [0,255] uint8 video clip)."""
    os.makedirs(out_dir, exist_ok=True)
    paths, buf = [], []
    count = 0
    total = len(dataset) if max_records is None else min(len(dataset), max_records)

    def flush():
        nonlocal buf
        if buf:
            p = os.path.join(out_dir, f"shard_{len(paths):04d}.tvis")
            write_shard(p, np.stack(buf))
            paths.append(p)
            buf = []

    for i in range(total):
        item = dataset.get_item(i)
        vid = ((item["video"] + 1.0) * 127.5).round().clip(0, 255).astype(np.uint8)
        buf.append(vid)
        count += 1
        if len(buf) >= records_per_shard:
            flush()
    flush()
    return paths


def ensure_native_lib(force: bool = False) -> Optional[str]:
    """Compile native/tvi_loader.cpp with g++ if needed; returns .so path or
    None when no toolchain is available."""
    if os.path.exists(_LIB) and not force:
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB],
            check=True, capture_output=True)
        return _LIB
    except (OSError, subprocess.CalledProcessError) as e:
        import sys

        print(f"[shards] native loader build failed: {e}", file=sys.stderr)
        return None


class NativeFrameLoader:
    """Threaded shard loader: yields {'video','first','end'} batches with
    video in [-1,1] float32, matching FrameInterpolationDataset.batches."""

    def __init__(self, shard_paths: Sequence[str], batch_size: int,
                 prefetch: int = 4, n_threads: int = 2, seed: int = 0):
        lib_path = ensure_native_lib()
        if lib_path is None:
            raise RuntimeError("native loader unavailable (no g++)")
        self._lib = ctypes.CDLL(lib_path)
        self._lib.tvi_loader_open.restype = ctypes.c_void_p
        self._lib.tvi_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
        self._lib.tvi_loader_next.argtypes = [ctypes.c_void_p,
                                              ctypes.POINTER(ctypes.c_float)]
        for fn in ("tvi_loader_frames", "tvi_loader_height", "tvi_loader_width"):
            getattr(self._lib, fn).argtypes = [ctypes.c_void_p]
            getattr(self._lib, fn).restype = ctypes.c_int
        self._lib.tvi_loader_num_records.argtypes = [ctypes.c_void_p]
        self._lib.tvi_loader_num_records.restype = ctypes.c_long
        self._lib.tvi_loader_close.argtypes = [ctypes.c_void_p]

        arr = (ctypes.c_char_p * len(shard_paths))(
            *[p.encode() for p in shard_paths])
        self._h = self._lib.tvi_loader_open(
            arr, len(shard_paths), batch_size, prefetch, n_threads, seed)
        if not self._h:
            raise RuntimeError(f"failed to open shards: {shard_paths}")
        self.batch_size = batch_size
        self.frames = self._lib.tvi_loader_frames(self._h)
        self.height = self._lib.tvi_loader_height(self._h)
        self.width = self._lib.tvi_loader_width(self._h)
        self.num_records = self._lib.tvi_loader_num_records(self._h)

    def next(self) -> Dict[str, np.ndarray]:
        out = np.empty((self.batch_size, self.frames, self.height,
                        self.width, 3), np.float32)
        rc = self._lib.tvi_loader_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise RuntimeError("native loader stopped")
        return {"video": out, "first": out[:, 0], "end": out[:, -1]}

    def batches(self, batch_size=None, steps: Optional[int] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        produced = 0
        while steps is None or produced < steps:
            yield self.next()
            produced += 1

    def close(self):
        if getattr(self, "_h", None):
            self._lib.tvi_loader_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

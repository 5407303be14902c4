"""ctypes binding for the native C++ data-loading runtime.

Builds ``native/libdadloader.so`` on first use (g++ + system OpenCV) and
exposes it as a batch iterator with the same dict contract as
``data.nyu.iterate_batches``. Falls back cleanly (``available()`` False) when
the toolchain or OpenCV dev libs are absent — callers then use the Python
loader.

Design: the C++ side owns a worker pool and a bounded prefetch queue
(native/dad_loader.cpp); Python pre-allocates NHWC float32 numpy buffers and
the workers fill them, so steady-state host work per batch is two memcpys.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("distill_any_depth_tpu.native")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libdadloader.so")
_BUILD_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False

__all__ = ["available", "NativeNYULoader"]


def _build() -> bool:
    global _BUILD_FAILED
    if os.path.exists(_SO_PATH):
        src = os.path.join(_NATIVE_DIR, "dad_loader.cpp")
        if os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
            return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, text=True, timeout=300,
        )
        return True
    except Exception as e:
        out = getattr(e, "stderr", "") or str(e)
        logger.warning("native loader build failed: %s", out[-500:])
        _BUILD_FAILED = True
        return False


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_FAILED or not _build():
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.dad_loader_create.restype = ctypes.c_void_p
        lib.dad_loader_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.dad_loader_set_epoch.restype = None
        lib.dad_loader_set_epoch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
        ]
        lib.dad_loader_num_samples.restype = ctypes.c_long
        lib.dad_loader_num_samples.argtypes = [ctypes.c_void_p]
        lib.dad_loader_next_batch.restype = ctypes.c_int
        lib.dad_loader_next_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.dad_loader_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _lib() is not None


class NativeNYULoader:
    """Prefetched NYU batch stream backed by the C++ runtime.

    Ordering policy lives HERE (data/nyu.epoch_order — seeded global shuffle
    then round-robin shard, the same code path as the Python loader); the
    C++ side decodes the installed order concurrently and delivers it
    deterministically via a reorder buffer. The two loaders therefore yield
    identical epochs for the same (csv, seed, shards), and resume is
    data-exact via the standard steps_per_epoch fast-forward."""

    def __init__(
        self,
        csv_path: str,
        root_dir: str,
        image_size: int = 392,
        batch_size: int = 16,
        normalize: bool = True,
        raw_255: bool = False,
        num_threads: int | None = None,
        queue_capacity: int = 64,
        shuffle: bool = True,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        if num_threads is None:
            num_threads = min(os.cpu_count() or 1, 8)
        self._lib = lib
        self._handle = lib.dad_loader_create(
            csv_path.encode(), root_dir.encode(), image_size,
            int(normalize), int(raw_255), num_threads, queue_capacity,
        )
        if not self._handle:
            raise FileNotFoundError(f"no samples loadable from {csv_path}")
        self.batch_size = batch_size
        self.image_size = image_size
        self.shuffle = shuffle
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = max(num_shards, 1)
        self._stream = self._index_stream(0)
        self._remaining = 0
        self._images = np.empty((batch_size, image_size, image_size, 3), np.float32)
        self._depths = np.empty((batch_size, image_size, image_size), np.float32)

    def __len__(self) -> int:
        """GLOBAL sample count (sharding happens per epoch, not per loader)."""
        return int(self._lib.dad_loader_num_samples(self._handle))

    def shard_len(self) -> int:
        return len(self) // self.num_shards

    def _index_stream(self, start_epoch: int):
        from distill_any_depth_tpu.data.nyu import epoch_order

        n = len(self)
        epoch = start_epoch
        while True:
            yield from epoch_order(
                n, seed=self.seed + epoch, shuffle=self.shuffle,
                shard_index=self.shard_index, num_shards=self.num_shards,
            )
            epoch += 1

    def _install(self, need: int) -> None:
        import itertools

        idx = np.fromiter(
            itertools.islice(self._stream, need), dtype=np.int64, count=need
        )
        self._lib.dad_loader_set_epoch(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
        )
        self._remaining = need

    def next_batch(self) -> dict:
        if self._remaining < self.batch_size:
            # installing resets C++ delivery state, so only top up when the
            # previous installment is fully drained (batches() installs a
            # whole epoch at once — the prefetch-friendly path)
            assert self._remaining == 0, "mixed batch sizes on one loader"
            self._install(self.batch_size)
        n = self._lib.dad_loader_next_batch(
            self._handle,
            self.batch_size,
            self._images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._depths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if n < self.batch_size:
            raise RuntimeError("native loader stream ended unexpectedly")
        self._remaining -= self.batch_size
        # copies: the internal buffers are reused by the next call
        return {"image": self._images.copy(), "depth": self._depths.copy()}

    def batches(self, steps: int, epoch: int | None = None):
        """Yield ``steps`` batches. With ``epoch`` given, the stream is
        repositioned to that epoch's seeded order (data-exact resume /
        validation replay); otherwise it continues where it left off."""
        if epoch is not None:
            self._stream = self._index_stream(epoch)
            self._remaining = 0
        if self._remaining == 0 and steps > 0:
            self._install(steps * self.batch_size)
        for _ in range(steps):
            yield self.next_batch()

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.dad_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

"""FMRS shard store: python writer + ctypes bindings to the C++ reader.

Capability parity with the reference's LMDB tooling
(/root/reference/basicsr/utils/lmdb_util.py:9-196 make_lmdb_from_imgs and
utils/file_client.py LmdbBackend), re-designed for the TPU host path: one
mmap'd packed file of raw uint8 images, C++ thread-pool batch sampling with
fused random-crop/flip/rot augmentation (no GIL, no per-sample Python), and
deterministic seeds.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from os import path as osp
from typing import List, Optional, Sequence, Tuple

import numpy as np

FMRS_SUFFIX = '.fmrs'
_MAGIC = b'FMRS1\x00\x00\x00'
_ENTRY = struct.Struct('<QIIII64s')

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _build_lib() -> Optional[str]:
    src = osp.join(osp.dirname(__file__), 'shardstore.cpp')
    out_dir = os.environ.get('FEMASR_NATIVE_CACHE',
                             osp.join(osp.expanduser('~'), '.cache',
                                      'femasr_tpu', 'native'))
    os.makedirs(out_dir, exist_ok=True)
    so_path = osp.join(out_dir, 'libshardstore.so')
    if (osp.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(src)):
        return so_path
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread',
           src, '-o', so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return so_path
    except (OSError, subprocess.CalledProcessError) as e:
        print(f'[native] shardstore build failed ({e}); '
              'falling back to pure-python reader')
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is None and not _LIB_TRIED:
        _LIB_TRIED = True
        so = _build_lib()
        if so is not None:
            lib = ctypes.CDLL(so)
            lib.fmrs_open.restype = ctypes.c_void_p
            lib.fmrs_open.argtypes = [ctypes.c_char_p]
            lib.fmrs_close.argtypes = [ctypes.c_void_p]
            lib.fmrs_count.restype = ctypes.c_uint64
            lib.fmrs_count.argtypes = [ctypes.c_void_p]
            lib.fmrs_meta.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                      ctypes.POINTER(ctypes.c_uint32),
                                      ctypes.c_char_p]
            lib.fmrs_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                      ctypes.POINTER(ctypes.c_uint8)]
            lib.fmrs_sample_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            _LIB = lib
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


class ShardStoreWriter:
    """Pack HWC uint8 RGB images into one .fmrs file.

    Streaming: pixel data is spooled to a sidecar file as images are
    added (only per-image metadata stays in RAM), then stitched behind
    the header+index at close — packing a full training set must not
    hold it in memory (the reference lmdb writer streams with periodic
    commits, lmdb_util.py:9-196).
    """

    def __init__(self, path: str):
        assert path.endswith(FMRS_SUFFIX), f'path must end with {FMRS_SUFFIX}'
        self.path = path
        self._meta: List[Tuple[bytes, int, int, int]] = []
        os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
        self._data_path = path + '.data.tmp'
        self._data_f = open(self._data_path, 'wb')

    def add(self, key: str, img: np.ndarray) -> None:
        assert img.dtype == np.uint8 and img.ndim == 3, 'HWC uint8 required'
        # mirror the C++ reader's corrupt-header bounds (shardstore.cpp
        # fmrs_open): a shard the writer produces must always be readable
        assert (img.shape[0] <= 1 << 21 and img.shape[1] <= 1 << 21
                and img.shape[2] <= 16), f'image too large: {img.shape}'
        kb = key.encode('utf-8')
        if len(kb) > 63:
            raise ValueError(
                f'shard key exceeds 63 utf-8 bytes: {key!r} — truncating '
                'would silently collide/corrupt keys; use shorter keys')
        self._meta.append((kb, *img.shape))
        self._data_f.write(np.ascontiguousarray(img).tobytes())

    def close(self) -> None:
        if self._data_f is None:  # idempotent: second close is a no-op
            return
        self._data_f.close()
        self._data_f = None
        n = len(self._meta)
        header_size = 16 + n * _ENTRY.size
        offset = header_size
        with open(self.path, 'wb') as f:
            f.write(_MAGIC)
            f.write(struct.pack('<Q', n))
            for kb, h, w, c in self._meta:
                f.write(_ENTRY.pack(offset, h, w, c, 0,
                                    kb.ljust(64, b'\x00')))
                offset += h * w * c
            with open(self._data_path, 'rb') as data_f:
                while True:
                    chunk = data_f.read(1 << 24)
                    if not chunk:
                        break
                    f.write(chunk)
        os.remove(self._data_path)

    def abort(self) -> None:
        """Discard the spool without finalizing a shard at the dest path."""
        if self._data_f is not None:
            self._data_f.close()
            self._data_f = None
        if osp.exists(self._data_path):
            os.remove(self._data_path)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        # on exception, do NOT finalize: a partial-but-valid-looking shard
        # at the destination path would silently truncate the dataset
        if exc_type is not None:
            self.abort()
        else:
            self.close()


class ShardStoreReader:
    """mmap reader; uses the C++ library when available, else pure python."""

    def __init__(self, path: str, num_threads: Optional[int] = None):
        self.path = path
        self.num_threads = num_threads or max(os.cpu_count() or 1, 1)
        self._lib = _get_lib()
        if self._lib is not None:
            self._handle = self._lib.fmrs_open(path.encode())
            if not self._handle:
                raise IOError(f'cannot open shard store: {path}')
            self._n = int(self._lib.fmrs_count(self._handle))
            self._meta = [self._read_meta(i) for i in range(self._n)]
        else:
            self._handle = None
            self._mmap = np.memmap(path, dtype=np.uint8, mode='r')
            assert bytes(self._mmap[:8]) == _MAGIC, 'bad magic'
            self._n = struct.unpack('<Q', bytes(self._mmap[8:16]))[0]
            self._meta = []
            self._offsets = []
            for i in range(self._n):
                off = 16 + i * _ENTRY.size
                entry = _ENTRY.unpack(bytes(self._mmap[off:off + _ENTRY.size]))
                self._offsets.append(entry[0])
                self._meta.append((entry[1], entry[2], entry[3],
                                   entry[5].rstrip(b'\x00').decode()))

    def _read_meta(self, i: int):
        meta = (ctypes.c_uint32 * 3)()
        key = ctypes.create_string_buffer(64)
        self._lib.fmrs_meta(self._handle, i, meta, key)
        return (meta[0], meta[1], meta[2], key.value.decode())

    def __len__(self) -> int:
        return self._n

    def keys(self) -> List[str]:
        return [m[3] for m in self._meta]

    def meta(self, idx: int) -> Tuple[int, int, int, str]:
        return self._meta[idx]

    def read(self, idx: int) -> np.ndarray:
        h, w, c, _ = self._meta[idx]
        if self._lib is not None:
            out = np.empty((h, w, c), np.uint8)
            rc = self._lib.fmrs_read(
                self._handle, idx,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            assert rc == 0
            return out
        off = self._offsets[idx]
        return np.array(self._mmap[off:off + h * w * c]).reshape(h, w, c)

    def sample_batch(self, indices: Sequence[int], crop: int,
                     hflip: bool = True, vflip: bool = True,
                     rot90: bool = True, seed: int = 0) -> np.ndarray:
        """Augmented (B, crop, crop, 3) uint8 batch (C++ fast path)."""
        if crop <= 0:
            # the C++ side treats crop=0 as whole-image mode and would
            # write past this fixed-shape buffer — full images have
            # per-item shapes, use read() for those
            raise ValueError(f'crop must be positive, got {crop}')
        batch = len(indices)
        out = np.empty((batch, crop, crop, 3), np.uint8)
        if self._lib is not None:
            idx_arr = (ctypes.c_uint64 * batch)(*indices)
            rc = self._lib.fmrs_sample_batch(
                self._handle, idx_arr, batch, crop, int(hflip), int(vflip),
                int(rot90), seed, self.num_threads,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if rc != 0:
                raise RuntimeError(f'fmrs_sample_batch failed: {rc}')
            return out
        # pure-python fallback
        rng = np.random.default_rng(seed)
        for b, idx in enumerate(indices):
            img = self.read(idx)
            h, w, _ = img.shape
            top = rng.integers(0, h - crop + 1)
            left = rng.integers(0, w - crop + 1)
            patch = img[top:top + crop, left:left + crop]
            if hflip and rng.integers(2):
                patch = patch[:, ::-1]
            if vflip and rng.integers(2):
                patch = patch[::-1]
            if rot90 and rng.integers(2):
                patch = patch.transpose(1, 0, 2)
            out[b] = patch
        return out

    def close(self) -> None:
        if self._lib is not None and self._handle:
            self._lib.fmrs_close(self._handle)
            self._handle = None


def make_shard_from_folder(folder: str, out_path: str,
                           suffix: str = 'png') -> int:
    """Pack an image-folder tree into a shard (reference lmdb_util parity)."""
    import cv2

    from ..data.data_util import make_dataset
    paths = make_dataset(folder)
    with ShardStoreWriter(out_path) as writer:
        for p in paths:
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            if img is None:
                continue
            writer.add(osp.splitext(osp.relpath(p, folder))[0],
                       cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    return len(paths)

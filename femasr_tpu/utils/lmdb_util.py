"""Training-archive creation (reference lmdb_util surface over FMRS shards).

Parity: /root/reference/basicsr/utils/lmdb_util.py (make_lmdb_from_imgs:9,
LmdbMaker::150-196). The LMDB C library is replaced by the native FMRS
shard store (femasr_tpu/native/shardstore.cpp) — same role (one packed
archive, key-indexed reads), mmap'd and decode-free.
"""

from __future__ import annotations

from os import path as osp
from typing import List, Optional

import cv2
import numpy as np


def make_lmdb_from_imgs(data_path: str, lmdb_path: str,
                        img_path_list: Optional[List[str]] = None,
                        keys: Optional[List[str]] = None,
                        batch: int = 5000, compress_level: int = 1,
                        multiprocessing_read: bool = False,
                        n_thread: int = 40, map_size=None) -> str:
    """Pack an image set into a shard archive (API-compatible signature).

    The reference writes PNG-encoded blobs into LMDB; we pack raw uint8 into
    an FMRS shard plus a meta_info.txt with the same line format
    (`key.png (h,w,c) compress_level`).
    """
    from ..native import ShardStoreWriter
    if lmdb_path.endswith('.lmdb'):
        lmdb_path = lmdb_path[:-5] + '.fmrs'
    assert lmdb_path.endswith('.fmrs'), "archive path should end with '.fmrs'"

    if img_path_list is None:
        from ..data.data_util import make_dataset
        full = make_dataset(data_path)
        img_path_list = [osp.relpath(p, data_path) for p in full]
        keys = [osp.splitext(p)[0] for p in img_path_list]
    assert keys is not None and len(keys) == len(img_path_list)

    meta_lines = []
    with ShardStoreWriter(lmdb_path) as writer:
        for rel, key in zip(img_path_list, keys):
            img = cv2.imread(osp.join(data_path, rel), cv2.IMREAD_COLOR)
            if img is None:
                continue
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            writer.add(key, rgb)
            h, w, c = rgb.shape
            meta_lines.append(f'{key}.png ({h},{w},{c}) {compress_level}\n')

    meta_path = lmdb_path + '.meta_info.txt'
    with open(meta_path, 'w') as f:
        f.writelines(meta_lines)
    return lmdb_path


class LmdbMaker:
    """Incremental archive writer (LmdbMaker parity over FMRS)."""

    def __init__(self, lmdb_path: str, map_size=None, batch: int = 5000,
                 compress_level: int = 1):
        from ..native import ShardStoreWriter
        if lmdb_path.endswith('.lmdb'):
            lmdb_path = lmdb_path[:-5] + '.fmrs'
        self.lmdb_path = lmdb_path
        self.compress_level = compress_level
        self._writer = ShardStoreWriter(lmdb_path)
        self._meta: List[str] = []

    def put(self, img_byte, key: str, img_shape) -> None:
        """img_byte: encoded bytes (reference API) or a raw uint8 array."""
        if isinstance(img_byte, np.ndarray):
            img = img_byte
        else:
            arr = np.frombuffer(img_byte, np.uint8)
            img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        self._writer.add(key, img)
        h, w, c = img.shape
        self._meta.append(f'{key}.png ({h},{w},{c}) {self.compress_level}\n')

    def close(self) -> None:
        self._writer.close()
        with open(self.lmdb_path + '.meta_info.txt', 'w') as f:
            f.writelines(self._meta)

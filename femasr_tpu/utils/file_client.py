"""File-client facade over storage backends.

Parity: /root/reference/basicsr/utils/file_client.py:132-167 (FileClient over
disk/lmdb/memcached). The lmdb backend is replaced by the native FMRS shard
store (femasr_tpu/native) — same role: one packed, mmap'd training archive.
"""

from __future__ import annotations

from typing import Any, Dict


class DiskBackend:
    def get(self, filepath: str) -> bytes:
        with open(filepath, 'rb') as f:
            return f.read()

    def get_text(self, filepath: str) -> str:
        with open(filepath, 'r') as f:
            return f.read()


class ShardBackend:
    """Read images from a .fmrs shard by key (replaces LmdbBackend)."""

    def __init__(self, db_paths, client_keys='default', **kwargs):
        from ..native import ShardStoreReader
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._clients: Dict[str, Any] = {}
        self._key_index: Dict[str, Dict[str, int]] = {}
        for ck, path in zip(client_keys, db_paths):
            reader = ShardStoreReader(path)
            self._clients[ck] = reader
            self._key_index[ck] = {k: i for i, k in enumerate(reader.keys())}

    def get(self, filepath: str, client_key: str = 'default'):
        reader = self._clients[client_key]
        idx = self._key_index[client_key][str(filepath)]
        return reader.read(idx)


class MemcachedBackend:  # pragma: no cover - optional service
    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        raise ImportError('memcached backend requires pymemcache/mc; '
                          'use disk or shard backends.')


class FileClient:
    """Backend dispatcher: disk | shard (lmdb-equivalent) | memcached."""

    _backends = {
        'disk': DiskBackend,
        'shard': ShardBackend,
        'lmdb': ShardBackend,  # alias: reference configs say `type: lmdb`
        'memcached': MemcachedBackend,
    }

    def __init__(self, backend: str = 'disk', **kwargs):
        if backend not in self._backends:
            raise ValueError(f'Backend {backend} is not supported. '
                             f'Currently supported ones are '
                             f'{list(self._backends.keys())}')
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath: str, client_key: str = 'default'):
        if self.backend in ('shard', 'lmdb'):
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath: str) -> str:
        return self.client.get_text(filepath)

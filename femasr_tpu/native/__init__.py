"""Native (C++) runtime components: FMRS shard store + batch sampler.

TPU-native analogue of the reference's native-library dependencies
(SURVEY.md §2.9): the LMDB C library behind utils/file_client.py:74-131 and
the multiprocess dataloader workers. Compiled on demand with g++ (cached
.so); ships a pure-python fallback reader so the framework works without a
toolchain.
"""

from .shardstore import (FMRS_SUFFIX, ShardStoreReader, ShardStoreWriter,
                         make_shard_from_folder, native_available)

__all__ = ['ShardStoreReader', 'ShardStoreWriter', 'make_shard_from_folder',
           'native_available', 'FMRS_SUFFIX']

from .dist_util import get_dist_info, init_dist, master_only
from .mesh import (TP_RULES, batch_sharding, create_mesh, is_main_process,
                   make_global_batch, param_shardings, replicated,
                   shard_params)

__all__ = ['get_dist_info', 'init_dist', 'master_only', 'TP_RULES',
           'batch_sharding', 'create_mesh', 'is_main_process',
           'make_global_batch', 'param_shardings', 'replicated',
           'shard_params']

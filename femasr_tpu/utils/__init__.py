from .checkpoint import (load_pytree, load_pytree_orbax, save_pytree,
                         save_pytree_orbax, to_host)
from .download_util import get_cache_dir, load_file_from_url
from .file_client import FileClient
from .img_util import (array2img, crop_border, imfrombytes, img2array,
                       img2tensor, imwrite, make_grid, tensor2img)
from .logger import (AvgTimer, MessageLogger, get_env_info, get_root_logger,
                     init_tb_logger, init_wandb_logger)
from .misc import (check_resume, get_time_str, is_image_file, make_exp_dirs,
                   mkdir_and_rename, new_rng, scandir, set_random_seed,
                   sizeof_fmt)
from .options import (apply_force_yml, copy_opt_file, dict2str, ordered_yaml,
                      parse_options, yaml_load)
from .registry import (ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY,
                       METRIC_REGISTRY, MODEL_REGISTRY, Registry)

# device-side JPEG + sharpening (reference basicsr.utils exports
# DiffJPEG / USMSharp / usm_sharp)
from ..ops.diffjpeg import jpeg_compress as diff_jpeg  # noqa: E402
from .img_process_util import USMSharp, filter2d, usm_sharp  # noqa: E402

__all__ = [
    'load_pytree', 'load_pytree_orbax', 'save_pytree', 'save_pytree_orbax',
    'to_host', 'get_cache_dir', 'load_file_from_url', 'FileClient',
    'array2img', 'crop_border', 'imfrombytes', 'img2array', 'img2tensor',
    'imwrite', 'make_grid', 'tensor2img',
    'AvgTimer', 'MessageLogger', 'get_env_info', 'get_root_logger',
    'init_tb_logger', 'init_wandb_logger',
    'check_resume', 'get_time_str', 'is_image_file', 'make_exp_dirs',
    'mkdir_and_rename', 'new_rng', 'scandir', 'set_random_seed', 'sizeof_fmt',
    'apply_force_yml', 'copy_opt_file', 'dict2str', 'ordered_yaml',
    'parse_options', 'yaml_load',
    'ARCH_REGISTRY', 'DATASET_REGISTRY', 'LOSS_REGISTRY', 'METRIC_REGISTRY',
    'MODEL_REGISTRY', 'Registry', 'diff_jpeg', 'USMSharp', 'usm_sharp',
    'filter2d',
]

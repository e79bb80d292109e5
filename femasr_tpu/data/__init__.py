from .data_util import (make_dataset, paired_paths_from_folders,
                        paired_paths_from_meta_info_file, paths_from_folder)
from .datasets import (BSRGANTrainDataset, PairedImageDataset,
                       SingleImageDataset)
from .degradations import (add_blur, add_gaussian_noise, add_jpeg_noise,
                           add_poisson_noise, add_resize, add_sharpening,
                           add_speckle_noise, anisotropic_gaussian_kernel,
                           degradation_bsrgan, degradation_bsrgan_plus,
                           fspecial, gen_kernel)
from .loader import DataLoader, build_dataloader, build_dataset
from .sampler import EnlargedSampler
from .transforms import (augment, img_rotate, mod_crop, paired_random_crop,
                         random_crop)

__all__ = [
    'make_dataset', 'paired_paths_from_folders',
    'paired_paths_from_meta_info_file', 'paths_from_folder',
    'BSRGANTrainDataset', 'PairedImageDataset', 'SingleImageDataset',
    'add_blur', 'add_gaussian_noise', 'add_jpeg_noise', 'add_poisson_noise',
    'add_resize', 'add_sharpening', 'add_speckle_noise',
    'anisotropic_gaussian_kernel', 'degradation_bsrgan',
    'degradation_bsrgan_plus', 'fspecial', 'gen_kernel',
    'DataLoader', 'build_dataloader', 'build_dataset', 'EnlargedSampler',
    'augment', 'img_rotate', 'mod_crop', 'paired_random_crop', 'random_crop',
]

from .vq import vq_argmin

__all__ = ['vq_argmin']

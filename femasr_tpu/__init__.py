"""femasr_tpu: TPU-native (JAX/XLA/Pallas/pjit) rebuild of FeMaSR.

A from-scratch, TPU-first implementation of the full capability surface of
chaofengc/FeMaSR (VQGAN-based real-world blind super-resolution): two-stage
training (HQ codebook pretrain + LQ SR stage), batched-tile inference,
on-device BSRGAN degradation synthesis, GAN/LPIPS/codebook losses, and a
pjit/shard_map data+model parallel runtime over a TPU device mesh.
"""

__version__ = '0.1.0'

# Restore standard JAX platform-selection semantics: if the user explicitly
# set JAX_PLATFORMS, honor it even when a sitecustomize pre-imported jax and
# pinned a different platform via config (which silently overrides the env
# var). No-op once a backend is initialized.
import os as _os  # noqa: E402

if _os.environ.get('JAX_PLATFORMS'):
    try:
        import jax as _jax
        _jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
    except Exception:  # backend already initialized / jax absent
        pass
del _os

"""femasr_tpu: TPU-native (JAX/XLA/Pallas/pjit) rebuild of FeMaSR.

A from-scratch, TPU-first implementation of the full capability surface of
chaofengc/FeMaSR (VQGAN-based real-world blind super-resolution): two-stage
training (HQ codebook pretrain + LQ SR stage), batched-tile inference,
on-device BSRGAN degradation synthesis, GAN/LPIPS/codebook losses, and a
pjit/shard_map data+model parallel runtime over a TPU device mesh.
"""

__version__ = '0.1.0'

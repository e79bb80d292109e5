"""TPU inference engine: whole-image and batched-tile super-resolution.

Capability parity with the reference's `FeMaSRNet.test` (pad-to-window,
femasr_arch.py:449-468) and `FeMaSRNet.test_tile` (overlap tiling,
femasr_arch.py:387-447), re-designed TPU-first:

- The reference loops tiles **sequentially** with dynamic per-tile shapes; we
  extract a uniform grid of overlapping tiles, stack them into one batch and
  run them through a single jitted forward — static shapes, one compilation,
  MXU-friendly batching. The 16px overlap is the halo.
- Arbitrary image sizes are handled by reflect-padding to the window multiple
  (whole-image path) or to the tile grid (tiled path); jit caches one
  executable per padded shape, so bucketed padding keeps recompiles bounded.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .femasr_arch import FeMaSRNet


def flip_pad(x: jax.Array, h_pad: int, w_pad: int) -> jax.Array:
    """Pad bottom/right by flip-concat, like femasr_arch.py:459-460."""
    h, w = x.shape[1], x.shape[2]
    if h_pad > 0:
        x = jnp.concatenate([x, jnp.flip(x, 1)], axis=1)[:, :h + h_pad]
    if w_pad > 0:
        x = jnp.concatenate([x, jnp.flip(x, 2)], axis=2)[:, :, :w + w_pad]
    return x


class SRInferencer:
    """Stateful wrapper: frozen params + per-shape jitted forwards."""

    def __init__(self, params, codebook_params=((32, 1024, 512),),
                 scale_factor: int = 4, dtype=jnp.float32,
                 gt_resolution: int = 256, norm_type: str = 'gn',
                 act_type: str = 'silu', vq_backend: str = 'xla',
                 max_tile_batch: int = 1, lq_stage: bool = True,
                 model: Optional[FeMaSRNet] = None, init_merge: bool = True,
                 mesh=None, tensor_parallel: bool = False,
                 s2d_tail: bool = False, ws2d_tail: Optional[bool] = None,
                 int8_tail: bool = False, int8_levels: int = 1,
                 int8_enc_up: bool = False, int8_swin: bool = False):
        ws2d_auto = ws2d_tail is None
        if ws2d_tail is None:
            # serving DEFAULT since round 5 for the release config (gn +
            # silu): the Pallas width-s2d decoder tail measured 153.8 vs
            # 159.3 ms same-window on the 512px program (NOTES_ROUND5.md).
            # Exact math, checkpoint-interchangeable params.
            # TPU-only default: on the CPU backend the kernel runs in
            # interpret mode (orders of magnitude slower) — the XLA tail
            # is the right CPU path; the dedicated ws2d tests cover the
            # kernel there.
            # ...and unsharded serving only: SPMD partitioning of the
            # Pallas call over a mesh is untested — pass ws2d_tail=True
            # explicitly to force it there. (Tile batching is fine: the
            # batch dim unrolls to per-sample kernel calls,
            # ops/pallas/ws2d_conv.py.)
            ws2d_tail = (norm_type == 'gn' and act_type == 'silu'
                         and not (s2d_tail or int8_tail)
                         and jax.default_backend() != 'cpu'
                         and mesh is None)
        def _mk(ws2d):
            return FeMaSRNet(
                codebook_params=[list(p) for p in codebook_params],
                LQ_stage=lq_stage, scale_factor=scale_factor,
                gt_resolution=gt_resolution, norm_type=norm_type,
                act_type=act_type, vq_backend=vq_backend, dtype=dtype,
                s2d_tail=s2d_tail, ws2d_tail=ws2d, int8_tail=int8_tail,
                int8_levels=int8_levels, int8_enc_up=int8_enc_up,
                int8_swin=int8_swin)
        self.model = model or _mk(ws2d_tail)
        # per-shape escape hatch: the ws2d kernel wins at large tiles
        # (512px LR: 153.8 vs 159.3 ms) but its fixed overheads lose at
        # small ones (256px LR: 1.547 vs 1.689 MP/s) — _forward picks
        # the XLA-tail twin (same params) for tiles below the measured
        # crossover. Explicit ws2d_tail=True (not auto) pins the kernel.
        self._model_small = (_mk(False) if model is None and ws2d_tail
                             and ws2d_auto else None)
        if init_merge:
            # complete possibly-partial param trees against a fresh init
            # (non-strict load parity with base_model.py:258-291)
            from .convert import merge_params
            init_hw = 32 * self.model.effective_scale_factor
            init = self.model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, init_hw, init_hw, 3), dtype))
            params = merge_params(init['params'], params)
        # optional multi-chip serving: batches shard over the mesh 'data'
        # axis (XLA inserts the collectives; beats the reference, whose
        # inference is strictly single-GPU — inference_femasr.py:39-63);
        # tensor_parallel additionally splits swin qkv/FFN + the codebook
        # over 'model' (parallel/mesh.py TP_RULES).
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, shard_params
            self.params = shard_params(mesh, params, tensor_parallel)
            self._batch_sharding = batch_sharding(mesh)
            self._dp = mesh.shape.get('data', 1)
        else:
            self.params = jax.device_put(params)
            self._dp = 1
        self.scale = self.model.effective_scale_factor
        self.dtype = dtype
        self.max_tile_batch = max_tile_batch
        # pad target: multiple of window_size * 8 at the Swin resolution
        # (femasr_arch.py:455): wsz = 8 // scale_factor * 8
        self.wsz = max(8 // self.scale, 1) * 8

        @jax.jit
        def _forward(params, x):
            mdl = self.model
            if (self._model_small is not None
                    and min(x.shape[1:3]) < 384):
                # static per-shape choice (jit retraces per shape):
                # below the measured ws2d crossover use the XLA tail
                mdl = self._model_small
            out, _, _, _ = mdl.apply({'params': params},
                                     x.astype(dtype))
            return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

        self._forward = _forward

        @jax.jit
        def _forward_chunks(params, xs):
            """(nC, chunk, h, w, 3) -> (nC, chunk, hs, ws, 3): the whole
            chunked tile grid inside ONE dispatch (lax.map serializes the
            chunks on-device — same peak memory as the python loop, no
            per-chunk dispatch overhead)."""
            return jax.lax.map(
                lambda xb: _forward(params, xb), xs)

        self._forward_chunks = _forward_chunks

    def _run(self, x: jax.Array) -> jax.Array:
        """Dispatch one batch; under a mesh, round the batch up to the data
        axis and shard it (computation follows the data placement)."""
        if self.mesh is None:
            return self._forward(self.params, x)
        b = x.shape[0]
        pad = (-b) % self._dp
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        x = jax.device_put(x, self._batch_sharding)
        return self._forward(self.params, x)[:b]

    # -- whole image ------------------------------------------------------

    def run_padded(self, x: jax.Array) -> jax.Array:
        """Forward with flip-padding to the next window multiple.

        x: (B, H, W, 3) in [0, 1]. Returns (B, H*s, W*s, 3) float32.
        """
        _, h_old, w_old, _ = x.shape
        h_pad = (h_old // self.wsz + 1) * self.wsz - h_old
        w_pad = (w_old // self.wsz + 1) * self.wsz - w_old
        x = flip_pad(x, h_pad, w_pad)
        out = self._run(x)
        return out[:, :h_old * self.scale, :w_old * self.scale]

    # -- batched tiles ------------------------------------------------------

    def run_tiled(self, x: jax.Array, tile_size: int = 240,
                  tile_pad: int = 16,
                  fuse_chunks: Optional[bool] = None) -> jax.Array:
        """Overlap-tiled SR: one batched jitted forward over all tiles.

        Replaces the reference's sequential y/x python loop
        (femasr_arch.py:404-446) with reflect-pad -> uniform tile grid ->
        batched forward -> center stitch.

        fuse_chunks=True additionally runs ALL chunks inside one jitted
        lax.map dispatch (single-device only) — removes per-chunk
        dispatch overhead on dispatch-bound hosts. Default (None) = auto:
        on when single-device. Measured on v5e (2026-08-17, 512px):
        batch>=2 conv programs compile to batch-interleaved layouts that
        run 1.7x MORE bytes per pixel (relay_watchdog hlo_bytes_b2:
        590 GB vs 2x171.6), while a chained lax.map of batch-1 programs
        matches pipelined batch-1 (303.8 vs 306.5 ms/tile) — so the
        default serving shape is tile batch 1, all tiles in one dispatch.
        """
        if fuse_chunks is None:
            fuse_chunks = self.mesh is None
        b, h, w, c = x.shape
        s = self.scale
        # round padded tile up to the window multiple
        padded_tile = tile_size + 2 * tile_pad
        padded_tile = math.ceil(padded_tile / self.wsz) * self.wsz
        eff_pad_total = padded_tile - tile_size  # split across both sides
        pad_lo = eff_pad_total // 2
        pad_hi = eff_pad_total - pad_lo

        tiles_y = math.ceil(h / tile_size)
        tiles_x = math.ceil(w / tile_size)
        grid_h, grid_w = tiles_y * tile_size, tiles_x * tile_size

        # reflect-pad: halo on all sides + grid round-up on bottom/right
        xp = jnp.pad(x, ((0, 0), (pad_lo, grid_h - h + pad_hi),
                         (pad_lo, grid_w - w + pad_hi), (0, 0)),
                     mode='reflect')

        # uniform overlapping tile grid, gathered as one batch
        tiles = []
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                y0, x0 = ty * tile_size, tx * tile_size
                tiles.append(jax.lax.dynamic_slice(
                    xp, (0, y0, x0, 0), (b, padded_tile, padded_tile, c)))
        batch = jnp.concatenate(tiles, axis=0)  # (B*nT, pt, pt, c)

        # chunked batched forward (static chunk shape -> single compile)
        n = batch.shape[0]
        chunk = min(self.max_tile_batch, n)
        if fuse_chunks and self.mesh is None:
            pad_n = (-n) % chunk
            if pad_n:
                batch = jnp.concatenate(
                    [batch, jnp.repeat(batch[-1:], pad_n, axis=0)], axis=0)
            stacked = batch.reshape(-1, chunk, *batch.shape[1:])
            out_tiles = self._forward_chunks(self.params, stacked)
            out_tiles = out_tiles.reshape(-1, *out_tiles.shape[2:])[:n]
            return self._stitch(out_tiles, b, h, w, c, tiles_y, tiles_x,
                                tile_size, pad_lo)
        outs = []
        for i in range(0, n, chunk):
            part = batch[i:i + chunk]
            if part.shape[0] < chunk:  # pad final chunk to the static shape
                reps = chunk - part.shape[0]
                part = jnp.concatenate(
                    [part, jnp.repeat(part[-1:], reps, axis=0)], axis=0)
                outs.append(self._run(part)[:n - i])
            else:
                outs.append(self._run(part))
        out_tiles = jnp.concatenate(outs, axis=0)
        return self._stitch(out_tiles, b, h, w, c, tiles_y, tiles_x,
                            tile_size, pad_lo)

    def _stitch(self, out_tiles, b, h, w, c, tiles_y, tiles_x, tile_size,
                pad_lo):
        """Paste tile centers back into the (B, H*s, W*s) canvas."""
        s = self.scale
        grid_h, grid_w = tiles_y * tile_size, tiles_x * tile_size
        out = jnp.zeros((b, grid_h * s, grid_w * s, c), jnp.float32)
        k = 0
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                center = out_tiles[k * b:(k + 1) * b,
                                   pad_lo * s:(pad_lo + tile_size) * s,
                                   pad_lo * s:(pad_lo + tile_size) * s]
                out = jax.lax.dynamic_update_slice(
                    out, center, (0, ty * tile_size * s, tx * tile_size * s, 0))
                k += 1
        return out[:, :h * s, :w * s]

    # -- bucketed folder inference -------------------------------------------

    def run_bucketed(self, imgs, bucket: int = 64, max_batch: int = 4):
        """SR a list of HWC [0,1] images with few compilations.

        TPU-first folder serving: images are flip-padded up to bucket-rounded
        window-multiple shapes, grouped per bucket and run as batches — one
        XLA program per bucket instead of one per distinct image size.
        Returns outputs in input order.
        """
        bucket = max(bucket, self.wsz)
        groups = {}
        for i, img in enumerate(imgs):
            h, w = img.shape[:2]
            bh = math.ceil((h + 1) / bucket) * bucket
            bw = math.ceil((w + 1) / bucket) * bucket
            groups.setdefault((bh, bw), []).append(i)

        outputs = [None] * len(imgs)
        s = self.scale
        for (bh, bw), idxs in groups.items():
            for start in range(0, len(idxs), max_batch):
                chunk = idxs[start:start + max_batch]
                batch = []
                for i in chunk:
                    x = jnp.asarray(imgs[i], jnp.float32)[None]
                    batch.append(flip_pad(x, bh - x.shape[1],
                                          bw - x.shape[2]))
                out = self._run(jnp.concatenate(batch, axis=0))
                for j, i in enumerate(chunk):
                    h, w = imgs[i].shape[:2]
                    outputs[i] = np.asarray(out[j, :h * s, :w * s])
        return outputs

    # -- dispatcher ---------------------------------------------------------

    def __call__(self, img: np.ndarray, max_size: int = 600,
                 tile_size: int = 240, tile_pad: int = 16,
                 fuse_chunks: Optional[bool] = None) -> np.ndarray:
        """SR a single HWC [0,1] RGB image; whole vs tiled by pixel count
        (inference_femasr.py:58-63)."""
        x = jnp.asarray(img, jnp.float32)[None]
        h, w = img.shape[:2]
        if h * w < max_size ** 2:
            out = self.run_padded(x)
        else:
            out = self.run_tiled(x, tile_size=tile_size, tile_pad=tile_pad,
                                 fuse_chunks=fuse_chunks)
        return np.asarray(out[0])


def load_inferencer(weight_path: str, scale_factor: int = 4,
                    dtype=jnp.float32, **kwargs) -> SRInferencer:
    """Build an SRInferencer from a torch .pth (auto-converted) or a native
    flax msgpack checkpoint."""
    codebook_params = kwargs.pop('codebook_params', ((32, 1024, 512),))
    if weight_path.endswith(('.pth', '.pt')):
        from .convert import convert_femasr_checkpoint, load_torch_checkpoint
        sd = load_torch_checkpoint(weight_path)
        params = convert_femasr_checkpoint(
            sd, codebook_params=codebook_params,
            LQ_stage=kwargs.get('lq_stage', True),  # HQ ckpts have a
            # different encoder layout — convert with the matching one
            scale_factor=scale_factor)
    else:
        from ..utils.checkpoint import load_pytree
        params = load_pytree(weight_path)
        if 'params' in params:
            params = params['params']
    return SRInferencer(params, codebook_params=codebook_params,
                        scale_factor=scale_factor, dtype=dtype, **kwargs)

"""Tiled inference for convolutional models (reference models/tiler.py).

Capability parity with the reference's ``FastTileWorker`` /
``TileWorker2Dto3D`` (diffsynth/models/tiler.py:110-234): split a large
image (or video) into overlapping spatial tiles, run a model per tile, and
blend the results with linear feathering masks so seams vanish.

TPU-first notes:
- NHWC / NTHWC layouts; every tile has the SAME static shape (edge tiles
  are clamped inward, reference tiler.py:146-148), so one compiled
  ``forward_fn`` serves every tile — no shape-churn recompiles.
- The blend masks are tiny host-side numpy; accumulation happens in fp32.
- The model may change resolution and channel count; pass ``scales``
  (C, H, W) like the reference's 3D worker (tiler.py:199).

The reference also carries an Unfold/Fold-based ``TileWorker`` used by
SD-era VAEs; ``FastTileWorker``'s clamped-tile algorithm is the one on
live paths and is what we reproduce (the Qwen VAE itself ignores tiling —
qwen_image_vae.py:706,719 — so this is an extension capability, not a
pipeline dependency).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _tile_tasks(size: int, tile: int, stride: int):
    """1-D clamped tile starts (reference tiler.py:141-149)."""
    tasks = []
    for lo in range(0, size, stride):
        if lo - stride >= 0 and lo - stride + tile >= size:
            continue
        hi = lo + tile
        if hi > size:
            lo, hi = max(size - tile, 0), size
        tasks.append((lo, hi))
    return tasks


def build_mask(h: int, w: int, is_bound, border_width: int | None = None):
    """Feathering mask (reference tiler.py:115-130): distance-to-edge ramp,
    clipped to [1, border]/border; edges flagged in ``is_bound``
    (top, bottom, left, right) blend at full weight."""
    if border_width is None:
        border_width = (h + w) // 4
    hh = np.arange(h)[:, None] * np.ones((1, w))
    ww = np.ones((h, 1)) * np.arange(w)[None, :]
    pad = np.full((h, w), border_width, np.float64)
    mask = np.stack([
        pad if is_bound[0] else hh + 1,
        pad if is_bound[1] else h - hh,
        pad if is_bound[2] else ww + 1,
        pad if is_bound[3] else w - ww,
    ]).min(axis=0)
    return (np.clip(mask, 1, border_width) / border_width).astype(np.float32)


def tiled_forward(forward_fn, x, tile_size: int, tile_stride: int,
                  border_width: int | None = None,
                  scales=(1, 1, 1), progress_bar=lambda t: t):
    """x: [B, H, W, C] -> blended forward_fn over overlapping tiles.

    forward_fn: [B, tile, tile, C] -> [B, tile*sH, tile*sW, C*sC].
    scales: (sC, sH, sW) output/input ratios (1,1,1 for shape-preserving
    models; (1, 8, 8) for an 8x upscaler-style decode, etc.).
    """
    b, h, w, c = x.shape
    sc, sh, sw = scales
    oh, ow, oc = int(h * sh), int(w * sw), int(c * sc)
    value = np.zeros((b, oh, ow, oc), np.float32)
    weight = np.zeros((1, oh, ow, 1), np.float32)

    tasks = [(hl, hr, wl, wr)
             for hl, hr in _tile_tasks(h, tile_size, tile_stride)
             for wl, wr in _tile_tasks(w, tile_size, tile_stride)]
    for hl, hr, wl, wr in progress_bar(tasks):
        out = np.asarray(forward_fn(x[:, hl:hr, wl:wr])).astype(np.float32)
        mask = build_mask(out.shape[1], out.shape[2],
                          (hl == 0, hr >= h, wl == 0, wr >= w),
                          border_width)[None, :, :, None]
        ohl, owl = int(hl * sh), int(wl * sw)
        value[:, ohl:ohl + out.shape[1], owl:owl + out.shape[2]] += out * mask
        weight[:, ohl:ohl + out.shape[1], owl:owl + out.shape[2]] += mask
    return jnp.asarray(value / weight)


def tiled_forward_3d(forward_fn, x, tile_size, tile_stride,
                     border_width: int | None = None,
                     scales=(1, 1, 1, 1), progress_bar=lambda t: t):
    """Video variant (reference TileWorker2Dto3D, tiler.py:164-234):
    x [B, T, H, W, C], spatial-only tiling (time processed whole).

    forward_fn: [B, T, th, tw, C] -> [B, T*sT, th*sH, tw*sW, C*sC].
    scales: (sC, sT, sH, sW).
    """
    b, t, h, w, c = x.shape
    sc, st, sh, sw = scales
    ot, oh, ow, oc = int(t * st), int(h * sh), int(w * sw), int(c * sc)
    tile_h, tile_w = (tile_size if isinstance(tile_size, (tuple, list))
                      else (tile_size, tile_size))
    stride_h, stride_w = (tile_stride if isinstance(tile_stride, (tuple, list))
                          else (tile_stride, tile_stride))
    value = np.zeros((b, ot, oh, ow, oc), np.float32)
    weight = np.zeros((1, ot, oh, ow, 1), np.float32)

    tasks = [(hl, hr, wl, wr)
             for hl, hr in _tile_tasks(h, tile_h, stride_h)
             for wl, wr in _tile_tasks(w, tile_w, stride_w)]
    for hl, hr, wl, wr in progress_bar(tasks):
        out = np.asarray(forward_fn(x[:, :, hl:hr, wl:wr])).astype(np.float32)
        mask = build_mask(out.shape[2], out.shape[3],
                          (hl == 0, hr >= h, wl == 0, wr >= w),
                          border_width)[None, None, :, :, None]
        ohl, owl = int(hl * sh), int(wl * sw)
        value[:, :, ohl:ohl + out.shape[2], owl:owl + out.shape[3]] += out * mask
        weight[:, :, ohl:ohl + out.shape[2], owl:owl + out.shape[3]] += mask
    return jnp.asarray(value / weight)

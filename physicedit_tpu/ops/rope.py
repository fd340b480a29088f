"""3D rotary position embeddings for the Qwen-Image DiT.

Rebuilds the behaviour of the reference QwenEmbedRope
(diffsynth/models/qwen_image_dit.py:60-225) as host-side NumPy table
construction + a jittable pairwise rotation.

Design notes (TPU-first):
- Tables are built once per (img_shapes, txt_len) on the host as float32
  cos/sin arrays and passed into jitted code as ordinary inputs, so the
  denoise scan sees them as constants — no complex dtypes on device.
- The rotation operates on adjacent pairs (x[2i], x[2i+1]) in fp32, exactly
  mirroring `apply_rotary_emb_qwen` (qwen_image_dit.py:51-57).

Axes: head_dim 128 = frame 16 + height 56 + width 56; theta 10000;
scale_rope=True centres the H/W indices around zero using negative
frequencies for the first half (qwen_image_dit.py:140-146).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

AXES_DIM = (16, 56, 56)
THETA = 10000.0


def _rope_angles(index: np.ndarray, dim: int, theta: float = THETA) -> np.ndarray:
    """Angle table: outer(index, theta^(-2i/dim)) — [len(index), dim//2]."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.outer(index.astype(np.float64), inv_freq)


def _axis_angles(index: np.ndarray, axes_dim: tuple = AXES_DIM) -> np.ndarray:
    """Concatenate per-axis angle tables -> [len(index), sum(axes)//2]."""
    return np.concatenate([_rope_angles(index, d) for d in axes_dim], axis=1)


@functools.lru_cache(maxsize=256)
def _video_angles(idx: int, frame: int, height: int, width: int,
                  axes_dim: tuple = AXES_DIM) -> np.ndarray:
    """Angles for one image/video: [frame*height*width, 64].

    `idx` is the image's position in img_shapes — it is used as the frame
    coordinate (qwen_image_dit.py:139), so the edit image sits at frame 1.
    scale_rope centres H/W: indices [-(h - h//2) .. -1, 0 .. h//2 - 1].
    """
    d0, d1, d2 = (d // 2 for d in axes_dim)
    f_ang = _rope_angles(np.arange(idx, idx + frame), axes_dim[0])
    h_idx = np.concatenate([np.arange(-(height - height // 2), 0), np.arange(height // 2)])
    w_idx = np.concatenate([np.arange(-(width - width // 2), 0), np.arange(width // 2)])
    h_ang = _rope_angles(h_idx, axes_dim[1])
    w_ang = _rope_angles(w_idx, axes_dim[2])

    out = np.empty((frame, height, width, d0 + d1 + d2), dtype=np.float64)
    out[..., :d0] = f_ang[:, None, None, :]
    out[..., d0:d0 + d1] = h_ang[None, :, None, :]
    out[..., d0 + d1:] = w_ang[None, None, :, :]
    return out.reshape(frame * height * width, d0 + d1 + d2)


def build_rope_tables(img_shapes: list[tuple[int, int, int]], txt_seq_len: int,
                      edit_rope_interpolation: bool = False,
                      axes_dim: tuple = AXES_DIM):
    """cos/sin tables for the joint sequence.

    Returns (img_cos, img_sin, txt_cos, txt_sin), each float32 [S, 64].

    Text tokens use purely positional angles offset past the largest video
    index (qwen_image_dit.py:161-162).  With edit_rope_interpolation, images
    after the first reuse a bilinearly subsampled copy of image 0's H/W grid
    (forward_sampling, qwen_image_dit.py:168-225).
    """
    vid = []
    max_vid_index = 0
    for idx, (frame, height, width) in enumerate(img_shapes):
        if edit_rope_interpolation and idx > 0:
            f0, h0, w0 = img_shapes[0]
            half = sum(axes_dim) // 2
            base = _video_angles(0, f0, h0, w0, axes_dim).reshape(f0, h0, w0, half)
            h_sel = np.linspace(0, h0 - 1, height).astype(np.int64)
            w_sel = np.linspace(0, w0 - 1, width).astype(np.int64)
            sampled = base[:, h_sel][:, :, w_sel].copy()
            # Frame axis still uses this image's own index.
            f_ang = _rope_angles(np.arange(idx, idx + frame), axes_dim[0])
            sampled[..., :axes_dim[0] // 2] = f_ang[:, None, None, :]
            vid.append(sampled.reshape(frame * height * width, half))
        else:
            vid.append(_video_angles(idx, frame, height, width, axes_dim))
        max_vid_index = max(height // 2, width // 2, max_vid_index)

    img_ang = np.concatenate(vid, axis=0)
    txt_ang = _axis_angles(np.arange(max_vid_index, max_vid_index + txt_seq_len), axes_dim)

    def cs(a):
        return np.cos(a).astype(np.float32), np.sin(a).astype(np.float32)

    img_cos, img_sin = cs(img_ang)
    txt_cos, txt_sin = cs(txt_ang)
    return img_cos, img_sin, txt_cos, txt_sin


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate adjacent pairs of the last dim; fp32 math, returns input dtype.

    x: [..., S, D]; cos/sin: [..., S, D//2] (broadcast over leading dims).

    TPU form: the textbook even/odd formulation (stride-2 slices + stack
    re-interleave) costs 4x its HBM roofline in lane shuffles — 2.20 ms
    per [2,24,8448,128] apply vs 0.57 ms for this rewrite
    (tools/proto_rope.py; bitwise-identical outputs).  Interleave the
    TABLES once (ci[2i]=ci[2i+1]=cos[i]; si[2i]=-sin[i], si[2i+1]=sin[i])
    and swap adjacent lanes of x, so the data path is one fused
    multiply-add pass:  out = x*ci + swap(x)*si.
    """
    d = x.shape[-1]
    ci = jnp.repeat(cos, 2, axis=-1)
    si = jnp.stack([-sin, sin], axis=-1).reshape(*sin.shape[:-1], d)
    xs = x.reshape(*x.shape[:-1], d // 2, 2)[..., ::-1].reshape(x.shape)
    out = x.astype(jnp.float32) * ci + xs.astype(jnp.float32) * si
    return out.astype(x.dtype)


def text_rope_tables(txt_len: int, max_vid_index: int,
                     axes_dim: tuple = AXES_DIM):
    """Standalone text cos/sin table starting at max_vid_index (the layout
    used per EliGen prompt segment, qwen_image_dit.py:441-445)."""
    ang = _axis_angles(np.arange(max_vid_index, max_vid_index + txt_len), axes_dim)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def max_vid_index_of(img_shapes: list, scale_rope: bool = True) -> int:
    return max((max(h // 2, w // 2) if scale_rope else max(h, w))
               for _, h, w in img_shapes)

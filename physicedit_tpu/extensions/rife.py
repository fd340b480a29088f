"""RIFE video frame interpolation (IFNet), TPU-native.

Capability parity with the reference extension
(DiffSynth-Studio/diffsynth/extensions/RIFE/__init__.py:8-242): a 3-scale
coarse-to-fine optical-flow network producing the midpoint frame between
two frames, plus the Interpolater / Smoother host drivers.

TPU-first redesign notes:
- NHWC, fp32 (the reference pins IFNet to float32).
- torch ``F.interpolate(bilinear, align_corners=False, antialias=False)``
  and ``grid_sample(bilinear, border, align_corners=True)`` are rebuilt as
  explicit gather-based bilinear samplers — XLA compiles them to fused
  dynamic-slices; exact torch semantics (jax.image.resize antialiases on
  downsample, which torch does not).
- The three IFBlocks differ only in their input resize scale; parameters
  are kept per-block (they are distinct weights), the body is one jitted
  function.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


_DN = ("NHWC", "HWIO", "NHWC")


def _prelu(x, a):
    return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def _conv_s2(p, x):
    """Conv2d(k=3, stride=2, padding=1) + PReLU."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=_DN) + p["b"].astype(x.dtype)
    return _prelu(out, p["a"])


def _conv_s1(p, x):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=_DN) + p["b"].astype(x.dtype)
    return _prelu(out, p["a"])


def _deconv(p, x):
    """ConvTranspose2d(k=4, stride=2, padding=1): H -> 2H.

    ``w`` is stored as the forward-conv HWIO kernel [4, 4, C_out, C_in]
    (torch layout [C_in, C_out, kH, kW] transposed (2,3,1,0));
    transpose_kernel=True computes the exact adjoint torch computes.
    """
    out = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=_DN, transpose_kernel=True)
    return out + p["b"].astype(x.dtype)


def _resize_bilinear(x, out_h: int, out_w: int):
    """torch F.interpolate(mode='bilinear', align_corners=False,
    antialias=False) on NHWC — half-pixel centers, edge clamp, no
    antialias filter (even when downsampling)."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_weights(n_in, n_out):
        src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
        src = jnp.clip(src, 0.0, n_in - 1.0)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        t = src - lo.astype(jnp.float32)
        return lo, hi, t.astype(x.dtype)

    ylo, yhi, ty = axis_weights(h, out_h)
    xlo, xhi, tx = axis_weights(w, out_w)
    top = x[:, ylo]
    bot = x[:, yhi]
    row = top * (1 - ty)[None, :, None, None] + bot * ty[None, :, None, None]
    left = row[:, :, xlo]
    right = row[:, :, xhi]
    return left * (1 - tx)[None, None, :, None] + right * tx[None, None, :, None]


def warp(img, flow):
    """Backward-warp img by flow (pixels), bilinear, border padding.

    img: [B, H, W, C]; flow: [B, H, W, 2] (dx, dy in pixels).  Equivalent
    to the reference's normalized-grid ``grid_sample(align_corners=True,
    padding_mode='border')`` composition (RIFE/__init__.py:8-23): with
    align_corners=True the normalization round-trips to pixel coordinates.
    """
    b, h, w, c = img.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    px = jnp.clip(gx[None] + flow[..., 0].astype(jnp.float32), 0.0, w - 1.0)
    py = jnp.clip(gy[None] + flow[..., 1].astype(jnp.float32), 0.0, h - 1.0)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    txf = (px - x0).astype(img.dtype)[..., None]
    tyf = (py - y0).astype(img.dtype)[..., None]

    def gather(yi, xi):
        flat = img.reshape(b, h * w, c)
        idx = yi * w + xi                       # [B, H, W]
        return jnp.take_along_axis(
            flat, idx.reshape(b, h * w, 1), axis=1).reshape(b, h, w, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - txf) + v01 * txf
    bot = v10 * (1 - txf) + v11 * txf
    return top * (1 - tyf) + bot * tyf


def _ifblock(p, x, flow, scale: float):
    """IFBlock (RIFE/__init__.py:34-57): downsample by `scale`, conv
    encoder (stride-4 total), 4 residual double-convs, two deconv heads.
    `scale` may be fractional (the reference passes float 4/2/1 over the
    user scale, RIFE/__init__.py:163); sizes floor like F.interpolate."""
    b, h, w, _ = x.shape
    hs, ws = int(h / scale), int(w / scale)
    x = _resize_bilinear(x, hs, ws)
    flow = _resize_bilinear(flow, hs, ws) * (1.0 / scale)
    feat = _conv_s2(p["conv0"][0], jnp.concatenate([x, flow], -1))
    feat = _conv_s2(p["conv0"][1], feat)
    for name in ("convblock0", "convblock1", "convblock2", "convblock3"):
        blk = p[name]
        feat = _conv_s1(blk[1], _conv_s1(blk[0], feat)) + feat
    f = p["conv1"]
    flow_out = _deconv(f["deconv2"], _prelu(_deconv(f["deconv1"], feat),
                                            f["prelu"]))
    m = p["conv2"]
    mask_out = _deconv(m["deconv2"], _prelu(_deconv(m["deconv1"], feat),
                                            m["prelu"]))
    flow_out = _resize_bilinear(flow_out, h, w) * float(scale)
    mask_out = _resize_bilinear(mask_out, h, w)
    return flow_out, mask_out


@functools.partial(jax.jit, static_argnames=("scale_list",))
def ifnet_forward(params, img0, img1, scale_list=(4, 2, 1)):
    """Midpoint-frame inference (RIFE/__init__.py:68-100, training=False).

    img0/img1: [B, H, W, 3] in [0, 1] (H, W divisible by 32·max-scale
    handled by the host wrapper).  Returns (flow, mask, merged midpoint).
    """
    b, h, w, _ = img0.shape
    dt = img0.dtype
    flow = jnp.zeros((b, h, w, 4), dt)
    mask = jnp.zeros((b, h, w, 1), dt)
    warped0, warped1 = img0, img1
    for i, scale in enumerate(scale_list):
        p = params[f"block{i}"]
        f0, m0 = _ifblock(p, jnp.concatenate([warped0, warped1, mask], -1),
                          flow, float(scale))
        f1, m1 = _ifblock(p, jnp.concatenate([warped1, warped0, -mask], -1),
                          jnp.concatenate([flow[..., 2:4], flow[..., :2]], -1),
                          float(scale))
        f1_sw = jnp.concatenate([f1[..., 2:4], f1[..., :2]], -1)
        flow = flow + (f0 + f1_sw) * 0.5
        mask = mask + (m0 - m1) * 0.5
        warped0 = warp(img0, flow[..., :2])
        warped1 = warp(img1, flow[..., 2:4])
    sig = jax.nn.sigmoid(mask)
    merged = warped0 * sig + warped1 * (1 - sig)
    return flow, sig, merged


# ---------------------------------------------------------------------------
# Init / conversion
# ---------------------------------------------------------------------------

def _conv_init(key, cin, cout, k=3):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (k, k, cin, cout), jnp.float32) * 0.05,
        "b": jnp.zeros((cout,), jnp.float32),
        "a": jnp.full((cout,), 0.25, jnp.float32),
    }


def _deconv_init(key, cin, cout):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (4, 4, cout, cin), jnp.float32) * 0.05,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def init_ifnet_params(key, c=90, in_planes=11):
    """in_planes = 7 image/mask channels + 4 flow channels."""
    def block(key):
        ks = iter(jax.random.split(key, 16))
        p = {
            "conv0": [_conv_init(next(ks), in_planes, c // 2),
                      _conv_init(next(ks), c // 2, c)],
            "conv1": {"deconv1": _deconv_init(next(ks), c, c // 2),
                      "prelu": jnp.full((c // 2,), 0.25, jnp.float32),
                      "deconv2": _deconv_init(next(ks), c // 2, 4)},
            "conv2": {"deconv1": _deconv_init(next(ks), c, c // 2),
                      "prelu": jnp.full((c // 2,), 0.25, jnp.float32),
                      "deconv2": _deconv_init(next(ks), c // 2, 1)},
        }
        for name in ("convblock0", "convblock1", "convblock2", "convblock3"):
            p[name] = [_conv_init(next(ks), c, c), _conv_init(next(ks), c, c)]
        return p

    k0, k1, k2 = jax.random.split(key, 3)
    return {"block0": block(k0), "block1": block(k1), "block2": block(k2)}


def _np(v):
    return np.asarray(v.numpy() if hasattr(v, "numpy") else v, np.float32)


def ifnet_from_torch(sd: dict) -> dict:
    """Convert the reference IFNet checkpoint (keys ``block{i}.conv....``,
    ``module.`` prefixes already stripped by the reference converter —
    RIFE/__init__.py:107-116; the unused training-only ``block_tea`` is
    dropped)."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def conv(prefix):
        return {
            "w": jnp.asarray(_np(sd[prefix + ".0.weight"]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(_np(sd[prefix + ".0.bias"])),
            "a": jnp.asarray(_np(sd[prefix + ".1.weight"]).reshape(-1)),
        }

    def deconv(prefix):
        # torch ConvTranspose2d weight [C_in, C_out, kH, kW] -> HW, C_out, C_in
        return {
            "w": jnp.asarray(_np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(_np(sd[prefix + ".bias"])),
        }

    def block(bi):
        pre = f"block{bi}"
        p = {
            "conv0": [conv(f"{pre}.conv0.0"), conv(f"{pre}.conv0.1")],
            "conv1": {"deconv1": deconv(f"{pre}.conv1.0"),
                      "prelu": jnp.asarray(
                          _np(sd[f"{pre}.conv1.1.weight"]).reshape(-1)),
                      "deconv2": deconv(f"{pre}.conv1.2")},
            "conv2": {"deconv1": deconv(f"{pre}.conv2.0"),
                      "prelu": jnp.asarray(
                          _np(sd[f"{pre}.conv2.1.weight"]).reshape(-1)),
                      "deconv2": deconv(f"{pre}.conv2.2")},
        }
        for name in ("convblock0", "convblock1", "convblock2", "convblock3"):
            p[name] = [conv(f"{pre}.{name}.0"), conv(f"{pre}.{name}.1")]
        return p

    return {f"block{i}": block(i) for i in range(3)}


def load_rife(path: str) -> dict:
    """Load a RIFE flownet checkpoint file into the IFNet pytree."""
    from physicedit_tpu.io.safetensors_io import load_state_dict

    return ifnet_from_torch(load_state_dict(path))


# ---------------------------------------------------------------------------
# Host drivers (reference RIFEInterpolater / RIFESmoother)
# ---------------------------------------------------------------------------

def _process_images(images):
    """PIL -> [N, H, W, 3] BGR float in [0,1], rounded UP to /32 sizes.

    Keeps the reference's BGR channel-flip quirk (RIFE/__init__.py:130-137).
    Documented divergence: the reference's non-/32 branch resizes to
    ``(w+31)//32`` *pixels* (processors/RIFE.py:25-29 — it forgets the
    ``*32``), collapsing any non-/32 frame to a few pixels and crashing
    IFNet's 1/4-scale stage; here the size rounds up to the next multiple
    of 32, which is plainly what that code meant."""
    out = []
    for image in images:
        width, height = image.size
        if width % 32 or height % 32:
            image = image.resize(((width + 31) // 32 * 32,
                                  (height + 31) // 32 * 32))
        out.append(np.asarray(image, np.float32)[:, :, [2, 1, 0]] / 255.0)
    return np.stack(out)


def _decode_images(arr, size=None):
    from PIL import Image

    arr = np.clip(arr[:, :, :, [2, 1, 0]] * 255.0, 0, 255).astype(np.uint8)
    images = [Image.fromarray(a) for a in arr]
    if size is not None and images and images[0].size != size:
        images = [im.resize(size) for im in images]
    return images


class RIFEInterpolater:
    """Doubles the frame rate `num_iter` times (RIFE/__init__.py:119-197)."""

    def __init__(self, params):
        self.params = params

    def _midpoints(self, frames, scale=1.0, batch_size=4):
        scale_list = tuple(float(s) / scale for s in (4, 2, 1))
        outs = []
        for i in range(0, frames.shape[0] - 1, batch_size):
            img0 = jnp.asarray(frames[i:i + batch_size])
            img1 = jnp.asarray(frames[i + 1:i + 1 + batch_size])
            n = min(img0.shape[0], img1.shape[0])
            _, _, merged = ifnet_forward(self.params, img0[:n], img1[:n],
                                         scale_list=scale_list)
            outs.append(np.asarray(merged))
        return np.clip(np.concatenate(outs, 0), 0.0, 1.0)

    def interpolate(self, images, scale=1.0, batch_size=4, num_iter=1,
                    progress_bar=lambda x: x):
        size = images[0].size
        frames = _process_images(images)
        for _ in range(num_iter):
            mid = self._midpoints(frames, scale, batch_size)
            inter = np.empty((frames.shape[0] + mid.shape[0],) + frames.shape[1:],
                             frames.dtype)
            inter[0::2] = frames
            inter[1::2] = mid
            frames = inter
        return _decode_images(frames, size)


class RIFESmoother(RIFEInterpolater):
    """Deflickers a rendered frame sequence (RIFE/__init__.py:200-242):
    interpolate frame i's neighbours (i-1, i+1), then blend with frame i."""

    def _pair(self, a, b, scale, batch_size):
        outs = []
        for i in range(0, a.shape[0], batch_size):
            _, _, merged = ifnet_forward(
                self.params, jnp.asarray(a[i:i + batch_size]),
                jnp.asarray(b[i:i + batch_size]),
                scale_list=tuple(float(s) / scale for s in (4, 2, 1)))
            outs.append(np.asarray(merged))
        return np.concatenate(outs, 0)

    def __call__(self, rendered_frames, scale=1.0, batch_size=4, num_iter=1,
                 **kwargs):
        size = rendered_frames[0].size
        frames = _process_images(rendered_frames)
        for _ in range(num_iter):
            mid = self._pair(frames[:-2], frames[2:], scale, batch_size)
            blended = self._pair(frames[1:-1], mid, scale, batch_size)
            frames[1:-1] = blended
        return _decode_images(frames, size)

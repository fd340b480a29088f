"""FastBlend patch-match kernels and runners.

Oracles: direct numpy transliterations of the reference CUDA kernels
(diffsynth/extensions/FastBlend/cupy_kernels.py:3-119) and torch's
area-interpolation for the pyramid resampler.
"""

import numpy as np
import pytest

from physicedit_tpu.extensions import fastblend as fb


def _np_remap(source_pad, nnf, patch_size, pad_size):
    b, hp, wp, c = source_pad.shape
    h, w = hp - 2 * pad_size, wp - 2 * pad_size
    r = (patch_size - 1) // 2
    out = np.zeros_like(source_pad)
    for bi in range(b):
        for x in range(h):
            for y in range(w):
                acc = np.zeros(c, np.float32)
                num = 0
                for px in range(max(-x, -r), min(h - 1 - x, r) + 1):
                    for py in range(max(-y, -r), min(w - 1 - y, r) + 1):
                        x_ = nnf[bi, x + px, y + py, 0] - px
                        y_ = nnf[bi, x + px, y + py, 1] - py
                        if x_ < 0 or y_ < 0 or x_ >= h or y_ >= w:
                            continue
                        num += 1
                        acc += source_pad[bi, x_ + pad_size, y_ + pad_size]
                out[bi, x + pad_size, y + pad_size] = acc / num
    return out


def _np_patch_error(source_pad, nnf, target_pad, patch_size, pad_size):
    b, hp, wp, c = source_pad.shape
    h, w = hp - 2 * pad_size, wp - 2 * pad_size
    r = (patch_size - 1) // 2
    err = np.zeros((b, h, w), np.float32)
    for bi in range(b):
        for x in range(h):
            for y in range(w):
                x_, y_ = nnf[bi, x, y]
                t = target_pad[bi, x + pad_size - r:x + pad_size + r + 1,
                               y + pad_size - r:y + pad_size + r + 1]
                s = source_pad[bi, x_ + pad_size - r:x_ + pad_size + r + 1,
                               y_ + pad_size - r:y_ + pad_size + r + 1]
                err[bi, x, y] = np.sum((t - s) ** 2)
    return err


@pytest.fixture()
def small_case():
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 12, 10, 3
    patch_size, pad_size = 5, 3
    src = rng.normal(size=(b, h, w, c)).astype(np.float32)
    src_pad = np.pad(src, ((0, 0), (pad_size, pad_size),
                           (pad_size, pad_size), (0, 0)))
    nnf = np.stack([rng.integers(0, h, (b, h, w)),
                    rng.integers(0, w, (b, h, w))], axis=-1).astype(np.int32)
    return src_pad, nnf, patch_size, pad_size


def test_remap_matches_cuda_semantics(small_case):
    src_pad, nnf, patch_size, pad_size = small_case
    got = np.asarray(fb._remap(src_pad, nnf, patch_size, pad_size))
    want = _np_remap(src_pad, nnf, patch_size, pad_size)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_patch_error_matches_cuda_semantics(small_case):
    src_pad, nnf, patch_size, pad_size = small_case
    rng = np.random.default_rng(1)
    tgt_pad = np.pad(
        rng.normal(size=(2, 12, 10, 3)).astype(np.float32),
        ((0, 0), (pad_size, pad_size), (pad_size, pad_size), (0, 0)))
    got = np.asarray(fb._patch_error(src_pad, nnf, tgt_pad,
                                     patch_size, pad_size))
    want = _np_patch_error(src_pad, nnf, tgt_pad, patch_size, pad_size)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pairwise_patch_error_matches_composition(small_case):
    src_pad, nnf, patch_size, pad_size = small_case
    got = np.asarray(fb._pairwise_patch_error(
        src_pad[0::2], nnf[0::2], src_pad[1::2], nnf[1::2],
        patch_size, pad_size))
    # pairwise error == patch_error of a vs b's gathered patches; check
    # against the numpy loop on the (a, b) pair
    b = src_pad.shape[0] // 2
    r = (patch_size - 1) // 2
    h, w = src_pad.shape[1] - 2 * pad_size, src_pad.shape[2] - 2 * pad_size
    want = np.zeros((b, h, w), np.float32)
    for bi in range(b):
        for x in range(h):
            for y in range(w):
                xa, ya = nnf[0::2][bi, x, y]
                xb, yb = nnf[1::2][bi, x, y]
                a = src_pad[0::2][bi, xa + pad_size - r:xa + pad_size + r + 1,
                                  ya + pad_size - r:ya + pad_size + r + 1]
                bb = src_pad[1::2][bi, xb + pad_size - r:xb + pad_size + r + 1,
                                   yb + pad_size - r:yb + pad_size + r + 1]
                want[bi, x, y] = np.sum((a - bb) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_area_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 13, 21, 3)).astype(np.float32)
    got = np.asarray(fb._area_resize(x, 6, 10))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=(6, 10), mode="area")
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_identity_nnf_remap_recovers_source(small_case):
    src_pad, _, patch_size, pad_size = small_case
    b = src_pad.shape[0]
    h, w = src_pad.shape[1] - 2 * pad_size, src_pad.shape[2] - 2 * pad_size
    ident = np.stack(np.meshgrid(np.arange(h), np.arange(w),
                                 indexing="ij"), axis=-1).astype(np.int32)
    ident = np.broadcast_to(ident, (b, h, w, 2))
    out = np.asarray(fb._remap(src_pad, ident, patch_size, pad_size))
    np.testing.assert_allclose(
        out[:, pad_size:-pad_size, pad_size:-pad_size],
        src_pad[:, pad_size:-pad_size, pad_size:-pad_size],
        rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pyramid_recovers_translation():
    """Shift an image by (4, 6); patch match must re-render the source
    style through the recovered correspondence close to the true target."""
    rng = np.random.default_rng(3)
    h = w = 64
    base = rng.uniform(0, 255, size=(h + 8, w + 8, 3)).astype(np.float32)
    # smooth it so patches are discriminative but not noise
    k = np.ones((3, 3, 1)) / 9.0
    from scipy.signal import convolve  # scipy ships with the stack

    base = convolve(base, k, mode="same")
    src = base[:h, :w]
    tgt = base[4:4 + h, 6:6 + w]
    engine = fb.PyramidPatchMatcher(
        image_height=h, image_width=w, channel=3, minimum_patch_size=5,
        num_iter=3, guide_weight=10.0, initialize="identity")
    _, rendered = engine.estimate_nnf(src[None], tgt[None], src[None])
    err = np.abs(rendered[0] - tgt).mean()
    base_err = np.abs(src - tgt).mean()
    assert err < base_err * 0.35, (err, base_err)


@pytest.mark.slow
def test_smooth_video_runs_and_reduces_flicker():
    rng = np.random.default_rng(4)
    h = w = 48
    base = rng.uniform(60, 200, size=(h, w, 3)).astype(np.float32)
    frames_guide, frames_style = [], []
    for i in range(5):
        frames_guide.append(base.clip(0, 255).astype(np.uint8))
        flicker = rng.normal(scale=12.0, size=(h, w, 3))
        frames_style.append((base + flicker).clip(0, 255).astype(np.uint8))
    for mode in ("Fast", "Balanced", "Accurate"):
        out = fb.smooth_video(frames_guide, frames_style, mode=mode,
                              window_size=4, batch_size=4,
                              minimum_patch_size=5, num_iter=2)
        assert len(out) == 5 and out[0].shape == (h, w, 3)
        assert out[0].dtype == np.uint8
        var_in = np.var(np.stack(frames_style, 0).astype(np.float32), axis=0).mean()
        var_out = np.var(np.stack(out, 0).astype(np.float32), axis=0).mean()
        assert var_out < var_in, (mode, var_out, var_in)


@pytest.mark.slow
def test_interpolate_video_keyframes():
    rng = np.random.default_rng(5)
    h = w = 48
    base = rng.uniform(60, 200, size=(h, w, 3)).astype(np.float32)
    guide = [base.clip(0, 255).astype(np.uint8) for _ in range(6)]
    key = (base * 0.5).clip(0, 255).astype(np.uint8)
    out = fb.interpolate_video(guide, [key, key], [0, 5], batch_size=4,
                               minimum_patch_size=5, num_iter=2)
    assert sum(f is not None for f in out) == 6
    # rendered frames should look like the style keyframe, not the guide
    assert np.abs(out[3].astype(np.float32) - key.astype(np.float32)).mean() \
        < np.abs(out[3].astype(np.float32) - base).mean()

    out1 = fb.interpolate_video(guide, [key], [0], batch_size=6,
                                tracking_window_size=1,
                                minimum_patch_size=5, num_iter=2)
    assert sum(f is not None for f in out1) == 6


def test_tiny_frames_still_blend():
    """Frames below ~2x the max patch size must still run (pyramid depth
    clamps to one level instead of skipping estimation)."""
    rng = np.random.default_rng(6)
    base = rng.uniform(60, 200, size=(20, 20, 3)).astype(np.float32)
    guide = [base.clip(0, 255).astype(np.uint8)] * 3
    style = [(base + rng.normal(scale=10, size=base.shape))
             .clip(0, 255).astype(np.uint8) for _ in range(3)]
    out = fb.smooth_video(guide, style, mode="Balanced", window_size=2,
                          batch_size=2, minimum_patch_size=5, num_iter=2)
    assert len(out) == 3 and out[0].shape == (20, 20, 3)
    assert out[0].dtype == np.uint8


def test_smoother_requires_guide_frames():
    with pytest.raises(ValueError, match="original_frames"):
        fb.FastBlendSmoother()([np.zeros((32, 32, 3), np.uint8)])

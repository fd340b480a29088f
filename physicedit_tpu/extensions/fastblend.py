"""FastBlend video deflicker (patch-match blending), TPU-native.

Rebuilds the reference's FastBlend extension
(diffsynth/extensions/FastBlend/) — the one place the reference embeds
native code (CuPy RawKernel CUDA-C strings, cupy_kernels.py:3-119).  The
three CUDA kernels become jitted XLA gather programs: per-pixel windowed
gathers are expressed as a `lax.fori_loop` over the patch window with a
flat `take_along_axis` gather per offset — everything batched over
(B, H, W) so the TPU vector units see full planes per step.

Algorithm map (reference file:line):
- remap / patch_error / pairwise_patch_error kernels
  (cupy_kernels.py:3-119)                       -> _remap, _patch_error,
                                                   _pairwise_patch_error
- PatchMatcher propagation/random-search/track loop
  (patch_match.py:8-203)                        -> PatchMatcher
- PyramidPatchMatcher: area-downsampled pyramid, identity/random NNF
  init, x2 NNF upscale + bilinear fix-up (patch_match.py:206-299)
                                                -> PyramidPatchMatcher
- TableManager binary-lifting blend tables + window sums
  (runners/fast.py:8-113)                       -> TableManager
- Fast / Balanced / Accurate / Interpolation(+SingleFrame) runners
  (runners/*.py)                                -> *ModeRunner
- FastBlendSmoother pipeline hook (__init__.py:7-66) -> FastBlendSmoother

Images are float32 [B, H, W, C] in [0, 255]; the NNF is int32
[B, H, W, 2] of (x, y) source coordinates, exactly the reference layout.
Randomness comes from a host-side numpy Generator (the reference's
cp.random is likewise outside the kernels).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Gather primitives (the CuPy RawKernel replacements)
# ---------------------------------------------------------------------------

def _gather2d(img, xi, yi):
    """img: [B, Hp, Wp, C]; xi/yi: [B, H, W] int32 -> [B, H, W, C]."""
    b, hp, wp, c = img.shape
    flat = img.reshape(b, hp * wp, c)
    idx = (xi * wp + yi).reshape(b, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(b, xi.shape[1], xi.shape[2], c)


@functools.partial(jax.jit, static_argnames=("patch_size", "pad_size"))
def _remap(source_pad, nnf, patch_size: int, pad_size: int):
    """remap kernel (cupy_kernels.py:3-43): target(x,y) = mean over the
    interior-clamped window of source[nnf(x+p) - p], skipping mapped
    coordinates that fall outside the image.  Returns a PADDED target
    (zeros in the pad ring), matching the reference buffer layout."""
    b, hp, wp, c = source_pad.shape
    h, w = hp - 2 * pad_size, wp - 2 * pad_size
    r = (patch_size - 1) // 2
    gx = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    gy = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    gx = jnp.broadcast_to(gx, (b, h, w))
    gy = jnp.broadcast_to(gy, (b, h, w))
    nx, ny = nnf[..., 0], nnf[..., 1]

    def body(i, acc_num):
        acc, num = acc_num
        px = i // patch_size - r
        py = i % patch_size - r
        # window position (x+px, y+py) must stay interior (the reference
        # clamps the loop bounds; here it's a mask)
        win_ok = ((gx + px >= 0) & (gx + px < h)
                  & (gy + py >= 0) & (gy + py < w))
        nxi = jnp.clip(gx + px, 0, h - 1)
        nyi = jnp.clip(gy + py, 0, w - 1)
        nnf_x = jnp.take_along_axis(
            nx.reshape(b, -1), (nxi * w + nyi).reshape(b, -1), 1
        ).reshape(b, h, w) - px
        nnf_y = jnp.take_along_axis(
            ny.reshape(b, -1), (nxi * w + nyi).reshape(b, -1), 1
        ).reshape(b, h, w) - py
        ok = (win_ok & (nnf_x >= 0) & (nnf_x < h)
              & (nnf_y >= 0) & (nnf_y < w))
        val = _gather2d(source_pad,
                        jnp.clip(nnf_x, 0, h - 1) + pad_size,
                        jnp.clip(nnf_y, 0, w - 1) + pad_size)
        okf = ok.astype(jnp.float32)[..., None]
        return acc + val * okf, num + okf

    acc = jnp.zeros((b, h, w, c), jnp.float32)
    num = jnp.zeros((b, h, w, 1), jnp.float32)
    acc, num = jax.lax.fori_loop(0, patch_size * patch_size, body, (acc, num))
    target = acc / jnp.maximum(num, 1.0)
    return jnp.pad(target, ((0, 0), (pad_size, pad_size),
                            (pad_size, pad_size), (0, 0)))


@functools.partial(jax.jit, static_argnames=("patch_size", "pad_size"))
def _patch_error(source_pad, nnf, target_pad, patch_size: int, pad_size: int):
    """patch_error kernel (cupy_kernels.py:46-79): SSD over the FULL
    (zero-padded) window between the target patch at (x,y) and the source
    patch at nnf(x,y)."""
    b, hp, wp, c = source_pad.shape
    h, w = hp - 2 * pad_size, wp - 2 * pad_size
    r = (patch_size - 1) // 2
    gx = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[None, :, None], (b, h, w))
    gy = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, None, :], (b, h, w))
    nx, ny = nnf[..., 0], nnf[..., 1]

    def body(i, err):
        px = i // patch_size - r
        py = i % patch_size - r
        t = _gather2d(target_pad, gx + pad_size + px, gy + pad_size + py)
        s = _gather2d(source_pad, nx + pad_size + px, ny + pad_size + py)
        return err + jnp.sum(jnp.square(t - s), axis=-1)

    err = jnp.zeros((b, h, w), jnp.float32)
    return jax.lax.fori_loop(0, patch_size * patch_size, body, err)


@functools.partial(jax.jit, static_argnames=("patch_size", "pad_size"))
def _pairwise_patch_error(sa_pad, nnf_a, sb_pad, nnf_b,
                          patch_size: int, pad_size: int):
    """pairwise_patch_error kernel (cupy_kernels.py:82-119): SSD between
    source_a at nnf_a and source_b at nnf_b."""
    b, hp, wp, c = sa_pad.shape
    h, w = hp - 2 * pad_size, wp - 2 * pad_size
    r = (patch_size - 1) // 2

    def body(i, err):
        px = i // patch_size - r
        py = i % patch_size - r
        a = _gather2d(sa_pad, nnf_a[..., 0] + pad_size + px,
                      nnf_a[..., 1] + pad_size + py)
        bb = _gather2d(sb_pad, nnf_b[..., 0] + pad_size + px,
                       nnf_b[..., 1] + pad_size + py)
        return err + jnp.sum(jnp.square(a - bb), axis=-1)

    err = jnp.zeros((b, h, w), jnp.float32)
    return jax.lax.fori_loop(0, patch_size * patch_size, body, err)


# ---------------------------------------------------------------------------
# Patch matcher (patch_match.py:8-203)
# ---------------------------------------------------------------------------

class PatchMatcher:
    def __init__(self, height, width, channel, minimum_patch_size,
                 num_iter=5, guide_weight=10.0, random_search_steps=3,
                 random_search_range=4, use_mean_target_style=False,
                 use_pairwise_patch_error=False, tracking_window_size=0,
                 rng=None):
        self.height = height
        self.width = width
        self.channel = channel
        self.minimum_patch_size = minimum_patch_size
        self.num_iter = num_iter
        self.guide_weight = guide_weight
        self.random_search_steps = random_search_steps
        self.random_search_range = random_search_range
        self.use_mean_target_style = use_mean_target_style
        self.use_pairwise_patch_error = use_pairwise_patch_error
        self.tracking_window_size = tracking_window_size
        self.rng = rng if rng is not None else np.random.default_rng(0)
        self.patch_size_list = [minimum_patch_size + i * 2
                                for i in range(num_iter)][::-1]
        self.pad_size = self.patch_size_list[0] // 2
        self.patch_size = self.patch_size_list[0]

    def pad_image(self, image):
        p = self.pad_size
        return jnp.pad(jnp.asarray(image, jnp.float32),
                       ((0, 0), (p, p), (p, p), (0, 0)))

    def unpad_image(self, image):
        p = self.pad_size
        return image[:, p:-p, p:-p, :]

    def apply_nnf_to_image(self, nnf, source_pad):
        return _remap(source_pad, nnf, self.patch_size, self.pad_size)

    def get_error(self, source_guide, target_guide, source_style,
                  target_style, nnf):
        error_guide = _patch_error(source_guide, nnf, target_guide,
                                   self.patch_size, self.pad_size)
        if self.use_mean_target_style:
            target_style = self.apply_nnf_to_image(nnf, source_style)
            target_style = jnp.broadcast_to(
                jnp.mean(target_style, axis=0, keepdims=True),
                target_style.shape)
        if self.use_pairwise_patch_error:
            err_half = _pairwise_patch_error(
                source_style[0::2], nnf[0::2], source_style[1::2], nnf[1::2],
                self.patch_size, self.pad_size)
            error_style = jnp.repeat(err_half, 2, axis=0)
        else:
            error_style = _patch_error(source_style, nnf, target_style,
                                       self.patch_size, self.pad_size)
        return error_guide * self.guide_weight + error_style

    def clamp_bound(self, nnf):
        return jnp.stack([jnp.clip(nnf[..., 0], 0, self.height - 1),
                          jnp.clip(nnf[..., 1], 0, self.width - 1)], axis=-1)

    def random_step(self, nnf, r):
        step = jnp.asarray(self.rng.integers(
            -r, r + 1, size=nnf.shape, dtype=np.int32))
        return self.clamp_bound(nnf + step)

    def neighboor_step(self, nnf, d):
        if d == 0:
            upd = jnp.concatenate([nnf[:, :1, :], nnf[:, :-1, :]], axis=1)
            upd = upd.at[..., 0].add(1)
        elif d == 1:
            upd = jnp.concatenate([nnf[:, :, :1], nnf[:, :, :-1]], axis=2)
            upd = upd.at[..., 1].add(1)
        elif d == 2:
            upd = jnp.concatenate([nnf[:, 1:, :], nnf[:, -1:, :]], axis=1)
            upd = upd.at[..., 0].add(-1)
        else:
            upd = jnp.concatenate([nnf[:, :, 1:], nnf[:, :, -1:]], axis=2)
            upd = upd.at[..., 1].add(-1)
        return self.clamp_bound(upd)

    def shift_nnf(self, nnf, d):
        if d > 0:
            d = min(nnf.shape[0], d)
            return jnp.concatenate([nnf[d:]] + [nnf[-1:]] * d, axis=0)
        d = max(-nnf.shape[0], d)
        return jnp.concatenate([nnf[:1]] * (-d) + [nnf[:d]], axis=0)

    def track_step(self, nnf, d):
        if self.use_pairwise_patch_error:
            upd = jnp.zeros_like(nnf)
            upd = upd.at[0::2].set(self.shift_nnf(nnf[0::2], d))
            upd = upd.at[1::2].set(self.shift_nnf(nnf[1::2], d))
            return upd
        return self.shift_nnf(nnf, d)

    def update(self, sg, tg, ss, ts, nnf, err, upd_nnf):
        upd_err = self.get_error(sg, tg, ss, ts, upd_nnf)
        better = upd_err < err
        nnf = jnp.where(better[..., None], upd_nnf, nnf)
        err = jnp.where(better, upd_err, err)
        return nnf, err

    def iteration(self, sg, tg, ss, ts, nnf, err):
        for d in self.rng.permutation(4):
            nnf, err = self.update(sg, tg, ss, ts, nnf, err,
                                   self.neighboor_step(nnf, int(d)))
        for _ in range(self.random_search_steps):
            nnf, err = self.update(
                sg, tg, ss, ts, nnf, err,
                self.random_step(nnf, self.random_search_range))
        for d in range(1, self.tracking_window_size + 1):
            nnf, err = self.update(sg, tg, ss, ts, nnf, err,
                                   self.track_step(nnf, d))
            nnf, err = self.update(sg, tg, ss, ts, nnf, err,
                                   self.track_step(nnf, -d))
        return nnf, err

    def estimate_nnf(self, source_guide, target_guide, source_style, nnf):
        sg = self.pad_image(source_guide)
        tg = self.pad_image(target_guide)
        ss = self.pad_image(source_style)
        for it in range(self.num_iter):
            self.patch_size = self.patch_size_list[it]
            ts = self.apply_nnf_to_image(nnf, ss)
            err = self.get_error(sg, tg, ss, ts, nnf)
            nnf, err = self.iteration(sg, tg, ss, ts, nnf, err)
        target_style = self.unpad_image(self.apply_nnf_to_image(nnf, ss))
        return nnf, target_style


# ---------------------------------------------------------------------------
# Pyramid (patch_match.py:206-299)
# ---------------------------------------------------------------------------

def _area_resize(images, height, width):
    """torch F.interpolate(mode='area') == adaptive average pooling:
    output cell (i, j) averages input rows [floor(iH/H'), ceil((i+1)H/H'))."""
    images = jnp.asarray(images, jnp.float32)
    b, h, w, c = images.shape
    if (h, w) == (height, width):
        return images

    def pool_axis(x, size, axis):
        n = x.shape[axis]
        cs = jnp.cumsum(x, axis=axis)
        cs = jnp.concatenate(
            [jnp.zeros_like(jnp.take(cs, jnp.asarray([0]), axis=axis)), cs],
            axis=axis)
        starts = np.floor(np.arange(size) * n / size).astype(np.int64)
        ends = np.ceil((np.arange(size) + 1) * n / size).astype(np.int64)
        hi = jnp.take(cs, jnp.asarray(ends), axis=axis)
        lo = jnp.take(cs, jnp.asarray(starts), axis=axis)
        cnt = jnp.asarray((ends - starts).astype(np.float32))
        shape = [1] * x.ndim
        shape[axis] = size
        return (hi - lo) / cnt.reshape(shape)

    images = pool_axis(images, height, 1)
    images = pool_axis(images, width, 2)
    return images


class PyramidPatchMatcher:
    def __init__(self, image_height, image_width, channel, minimum_patch_size,
                 threads_per_block=8, num_iter=5, gpu_id=0, guide_weight=10.0,
                 use_mean_target_style=False, use_pairwise_patch_error=False,
                 tracking_window_size=0, initialize="identity", seed=0):
        del threads_per_block, gpu_id  # CUDA launch geometry: meaningless on TPU
        maximum_patch_size = minimum_patch_size + (num_iter - 1) * 2
        # >= 1 level: frames smaller than ~2x the max patch would compute
        # log2 <= 0 and skip estimation entirely (the kernels themselves
        # handle any size via zero padding)
        self.pyramid_level = max(1, int(np.log2(
            min(image_height, image_width) / maximum_patch_size)))
        self.pyramid_heights = []
        self.pyramid_widths = []
        self.patch_matchers = []
        self.minimum_patch_size = minimum_patch_size
        self.num_iter = num_iter
        self.initialize = initialize
        self.rng = np.random.default_rng(seed)
        for level in range(self.pyramid_level):
            height = image_height // (2 ** (self.pyramid_level - 1 - level))
            width = image_width // (2 ** (self.pyramid_level - 1 - level))
            self.pyramid_heights.append(height)
            self.pyramid_widths.append(width)
            self.patch_matchers.append(PatchMatcher(
                height, width, channel, minimum_patch_size=minimum_patch_size,
                num_iter=num_iter, guide_weight=guide_weight,
                use_mean_target_style=use_mean_target_style,
                use_pairwise_patch_error=use_pairwise_patch_error,
                tracking_window_size=tracking_window_size, rng=self.rng))

    def initialize_nnf(self, batch_size):
        height, width = self.pyramid_heights[0], self.pyramid_widths[0]
        if self.initialize == "random":
            nnf = np.stack([
                self.rng.integers(0, height, (batch_size, height, width)),
                self.rng.integers(0, width, (batch_size, height, width)),
            ], axis=3).astype(np.int32)
        elif self.initialize == "identity":
            nnf = np.stack([
                np.repeat(np.arange(height), width).reshape(height, width),
                np.tile(np.arange(width), height).reshape(height, width),
            ], axis=2).astype(np.int32)
            nnf = np.stack([nnf] * batch_size)
        else:
            raise NotImplementedError(self.initialize)
        return jnp.asarray(nnf)

    def update_nnf(self, nnf, level):
        # x2 upscale with sub-pixel offsets (patch_match.py:261-275)
        nnf = jnp.repeat(jnp.repeat(nnf, 2, axis=1), 2, axis=2) * 2
        nnf = nnf.at[:, 1::2, :, 0].add(1)
        nnf = nnf.at[:, :, 1::2, 1].add(1)
        height, width = self.pyramid_heights[level], self.pyramid_widths[level]
        if (height, width) != nnf.shape[1:3]:
            nnf = jax.image.resize(
                nnf.astype(jnp.float32),
                (nnf.shape[0], height, width, 2), method="bilinear"
            ).astype(jnp.int32)
            nnf = self.patch_matchers[level].clamp_bound(nnf)
        return nnf

    def estimate_nnf(self, source_guide, target_guide, source_style):
        source_guide = jnp.asarray(source_guide, jnp.float32)
        target_guide = jnp.asarray(target_guide, jnp.float32)
        source_style = jnp.asarray(source_style, jnp.float32)
        nnf = target_style = None
        for level in range(self.pyramid_level):
            nnf = (self.initialize_nnf(source_guide.shape[0]) if level == 0
                   else self.update_nnf(nnf, level))
            h, w = self.pyramid_heights[level], self.pyramid_widths[level]
            sg = _area_resize(source_guide, h, w)
            tg = _area_resize(target_guide, h, w)
            ss = _area_resize(source_style, h, w)
            nnf, target_style = self.patch_matchers[level].estimate_nnf(
                sg, tg, ss, nnf)
        return np.asarray(nnf), np.asarray(target_style)


# ---------------------------------------------------------------------------
# Runners (runners/fast.py, balanced.py, accurate.py, interpolation.py)
# ---------------------------------------------------------------------------

class TableManager:
    """Binary-lifting remapping/blending tables (runners/fast.py:8-113)."""

    def task_list(self, n):
        tasks = []
        max_level = 1
        while (1 << max_level) <= n:
            max_level += 1
        for i in range(n):
            j = i
            for level in range(max_level):
                if i & (1 << level):
                    continue
                j |= 1 << level
                if j >= n:
                    break
                tasks.append({"source": i, "target": j, "level": level + 1})
        tasks.sort(key=lambda u: u["level"])
        return tasks

    def build_remapping_table(self, frames_guide, frames_style, engine,
                              batch_size):
        n = len(frames_guide)
        tasks = self.task_list(n)
        table = [[(np.asarray(frames_style[i], np.float32), 1)]
                 for i in range(n)]
        for bi in range(0, len(tasks), batch_size):
            batch = tasks[bi: bi + batch_size]
            sg = np.stack([frames_guide[t["source"]] for t in batch])
            tg = np.stack([frames_guide[t["target"]] for t in batch])
            ss = np.stack([frames_style[t["source"]] for t in batch])
            _, ts = engine.estimate_nnf(sg, tg, ss)
            for t, result in zip(batch, ts):
                target, level = t["target"], t["level"]
                if len(table[target]) == level:
                    table[target].append((result, 1))
                else:
                    frame, weight = table[target][level]
                    table[target][level] = (
                        frame * (weight / (weight + 1)) + result / (weight + 1),
                        weight + 1)
        return table

    def remapping_table_to_blending_table(self, table):
        for i in range(len(table)):
            for j in range(1, len(table[i])):
                f1, w1 = table[i][j - 1]
                f2, w2 = table[i][j]
                table[i][j] = ((f1 + f2) / 2, w1 + w2)
        return table

    def tree_query(self, leftbound, rightbound):
        node_list = []
        node_index = rightbound
        while node_index >= leftbound:
            node_level = 0
            while ((1 << node_level) & node_index
                   and node_index - (1 << (node_level + 1)) + 1 >= leftbound):
                node_level += 1
            node_list.append((node_index, node_level))
            node_index -= 1 << node_level
        return node_list

    def process_window_sum(self, frames_guide, blending_table, engine,
                           window_size, batch_size):
        n = len(blending_table)
        tasks = []
        frames_result = []
        for target in range(n):
            for source, level in self.tree_query(
                    max(target - window_size, 0), target):
                if source != target:
                    tasks.append({"source": source, "target": target,
                                  "level": level})
                else:
                    frames_result.append(blending_table[target][level])
        for bi in range(0, len(tasks), batch_size):
            batch = tasks[bi: bi + batch_size]
            sg = np.stack([frames_guide[t["source"]] for t in batch])
            tg = np.stack([frames_guide[t["target"]] for t in batch])
            ss = np.stack([blending_table[t["source"]][t["level"]][0]
                           for t in batch])
            _, ts = engine.estimate_nnf(sg, tg, ss)
            for t, frame_2 in zip(batch, ts):
                source, target, level = t["source"], t["target"], t["level"]
                frame_1, weight_1 = frames_result[target]
                weight_2 = blending_table[source][level][1]
                weight = weight_1 + weight_2
                frames_result[target] = (
                    frame_1 * (weight_1 / weight) + frame_2 * (weight_2 / weight),
                    weight)
        return frames_result


def _default_config():
    return {"minimum_patch_size": 5, "num_iter": 5, "guide_weight": 10.0,
            "initialize": "identity", "tracking_window_size": 0}


def _engine_kwargs(ebsynth_config):
    kw = dict(_default_config())
    kw.update(ebsynth_config or {})
    kw.pop("threads_per_block", None)
    kw.pop("gpu_id", None)
    return kw


def _save_frame(frame, save_path, index):
    if save_path is not None:
        from PIL import Image

        Image.fromarray(frame).save(
            os.path.join(save_path, "%05d.png" % index))


class FastModeRunner:
    """O(n log n) two-direction binary-lifting blend (runners/fast.py:116-150)."""

    def run(self, frames_guide, frames_style, batch_size, window_size,
            ebsynth_config, save_path=None):
        frames_guide = [np.asarray(f, np.float32) for f in frames_guide]
        frames_style = [np.asarray(f, np.float32) for f in frames_style]
        tm = TableManager()
        engine = PyramidPatchMatcher(
            image_height=frames_style[0].shape[0],
            image_width=frames_style[0].shape[1],
            channel=3, **_engine_kwargs(ebsynth_config))
        table_l = tm.build_remapping_table(frames_guide, frames_style, engine,
                                           batch_size)
        table_l = tm.remapping_table_to_blending_table(table_l)
        table_l = tm.process_window_sum(frames_guide, table_l, engine,
                                        window_size, batch_size)
        table_r = tm.build_remapping_table(frames_guide[::-1],
                                           frames_style[::-1], engine,
                                           batch_size)
        table_r = tm.remapping_table_to_blending_table(table_r)
        table_r = tm.process_window_sum(frames_guide[::-1], table_r, engine,
                                        window_size, batch_size)[::-1]
        frames = []
        for (f_l, w_l), f_m, (f_r, w_r) in zip(table_l, frames_style, table_r):
            w_m = -1  # the style frame was double-counted in both tables
            weight = w_l + w_m + w_r
            frames.append(f_l * (w_l / weight) + f_m * (w_m / weight)
                          + f_r * (w_r / weight))
        frames = [f.clip(0, 255).astype("uint8") for f in frames]
        for i, f in enumerate(frames):
            _save_frame(f, save_path, i)
        return frames


class BalancedModeRunner:
    """O(n * window) symmetric-window average (runners/balanced.py)."""

    def run(self, frames_guide, frames_style, batch_size, window_size,
            ebsynth_config, save_path=None):
        frames_guide = [np.asarray(f, np.float32) for f in frames_guide]
        frames_style = [np.asarray(f, np.float32) for f in frames_style]
        engine = PyramidPatchMatcher(
            image_height=frames_style[0].shape[0],
            image_width=frames_style[0].shape[1],
            channel=3, **_engine_kwargs(ebsynth_config))
        n = len(frames_style)
        tasks = [(s, t) for t in range(n)
                 for s in range(t - window_size, t + window_size + 1)
                 if 0 <= s < n and s != t]
        acc = [(frames_style[i].copy(), 1) for i in range(n)]
        out = [None] * n
        for bi in range(0, len(tasks), batch_size):
            batch = tasks[bi: bi + batch_size]
            sg = np.stack([frames_guide[s] for s, _ in batch])
            tg = np.stack([frames_guide[t] for _, t in batch])
            ss = np.stack([frames_style[s] for s, _ in batch])
            _, ts = engine.estimate_nnf(sg, tg, ss)
            for (s, t), result in zip(batch, ts):
                frame, weight = acc[t]
                acc[t] = (frame * (weight / (weight + 1))
                          + result / (weight + 1), weight + 1)
                full = min(n, t + window_size + 1) - max(0, t - window_size)
                if weight + 1 == full:
                    out[t] = acc[t][0].clip(0, 255).astype("uint8")
                    _save_frame(out[t], save_path, t)
        for t in range(n):  # frames whose window never filled (tiny n)
            if out[t] is None:
                out[t] = acc[t][0].clip(0, 255).astype("uint8")
                _save_frame(out[t], save_path, t)
        return out


class AccurateModeRunner:
    """O(n * window) mean-target-style remap (runners/accurate.py)."""

    def run(self, frames_guide, frames_style, batch_size, window_size,
            ebsynth_config, save_path=None):
        frames_guide = [np.asarray(f, np.float32) for f in frames_guide]
        frames_style = [np.asarray(f, np.float32) for f in frames_style]
        engine = PyramidPatchMatcher(
            image_height=frames_style[0].shape[0],
            image_width=frames_style[0].shape[1],
            channel=3, use_mean_target_style=True,
            **_engine_kwargs(ebsynth_config))
        n = len(frames_style)
        out = []
        for target in range(n):
            l, r = max(target - window_size, 0), min(target + window_size + 1, n)
            remapped = []
            for i in range(l, r, batch_size):
                j = min(i + batch_size, r)
                sg = np.stack([frames_guide[s] for s in range(i, j)])
                tg = np.stack([frames_guide[target]] * (j - i))
                ss = np.stack([frames_style[s] for s in range(i, j)])
                _, ts = engine.estimate_nnf(sg, tg, ss)
                remapped.append(ts)
            frame = np.concatenate(remapped, axis=0).mean(axis=0)
            frame = frame.clip(0, 255).astype("uint8")
            out.append(frame)
            _save_frame(frame, save_path, target)
        return out


class InterpolationModeRunner:
    """Keyframe interpolation with pairwise patch error (runners/interpolation.py)."""

    def get_weight(self, l, m, r):
        weight_l, weight_r = abs(m - r), abs(m - l)
        if weight_l + weight_r == 0:
            return 0.5, 0.5
        return (weight_l / (weight_l + weight_r),
                weight_r / (weight_l + weight_r))

    def get_task_group(self, index_style, n):
        task_group = []
        index_style = sorted(index_style)
        if index_style[0] > 0:
            task_group.append([(index_style[0], m, index_style[0])
                               for m in range(index_style[0])])
        for l, r in zip(index_style[:-1], index_style[1:]):
            task_group.append([(l, m, r) for m in range(l, r)])
        task_group.append([(index_style[-1], m, index_style[-1])
                           for m in range(index_style[-1], n)])
        return task_group

    def run(self, frames_guide, frames_style, index_style, batch_size,
            ebsynth_config, save_path=None):
        frames_guide = [np.asarray(f, np.float32) for f in frames_guide]
        frames_style = [np.asarray(f, np.float32) for f in frames_style]
        engine = PyramidPatchMatcher(
            image_height=frames_style[0].shape[0],
            image_width=frames_style[0].shape[1],
            channel=3, use_pairwise_patch_error=True,
            **_engine_kwargs(ebsynth_config))
        index_dict = {index: i for i, index in enumerate(index_style)}
        out = [None] * len(frames_guide)
        for tasks in self.get_task_group(index_style, len(frames_guide)):
            for bi in range(0, len(tasks), batch_size):
                batch = tasks[bi: bi + batch_size]
                sg, tg, ss = [], [], []
                for l, m, r in batch:
                    sg.append(frames_guide[l])
                    tg.append(frames_guide[m])
                    ss.append(frames_style[index_dict[l]])
                    sg.append(frames_guide[r])
                    tg.append(frames_guide[m])
                    ss.append(frames_style[index_dict[r]])
                _, ts = engine.estimate_nnf(
                    np.stack(sg), np.stack(tg), np.stack(ss))
                for f_l, f_r, (l, m, r) in zip(ts[0::2], ts[1::2], batch):
                    w_l, w_r = self.get_weight(l, m, r)
                    frame = (f_l * w_l + f_r * w_r).clip(0, 255).astype("uint8")
                    out[m] = frame
                    _save_frame(frame, save_path, m)
        return out


class InterpolationModeSingleFrameRunner:
    """One style keyframe tracked across the whole video
    (runners/interpolation.py:88-121)."""

    def run(self, frames_guide, frames_style, index_style, batch_size,
            ebsynth_config, save_path=None):
        cfg = _engine_kwargs(ebsynth_config)
        tws = cfg.get("tracking_window_size", 0)
        if tws * 2 >= batch_size:
            raise ValueError("batch_size should be larger than "
                             "tracking_window_size * 2")
        frame_style = np.asarray(frames_style[0], np.float32)
        frame_guide = np.asarray(frames_guide[index_style[0]], np.float32)
        engine = PyramidPatchMatcher(
            image_height=frame_style.shape[0],
            image_width=frame_style.shape[1], channel=3, **cfg)
        frame_id, n = 0, len(frames_guide)
        out = [None] * n
        for i in range(0, n, batch_size - tws * 2):
            l, r = (max(n - batch_size, 0), n) if i + batch_size > n \
                else (i, i + batch_size)
            sg = np.stack([frame_guide] * (r - l))
            tg = np.stack([np.asarray(frames_guide[j], np.float32)
                           for j in range(l, r)])
            ss = np.stack([frame_style] * (r - l))
            _, ts = engine.estimate_nnf(sg, tg, ss)
            for j, frame in zip(range(l, r), ts):
                if j == frame_id:
                    out[frame_id] = frame.clip(0, 255).astype("uint8")
                    _save_frame(out[frame_id], save_path, frame_id)
                    frame_id += 1
                if r < n and r - frame_id <= tws:
                    break
            if frame_id >= n:
                break
        return out


# ---------------------------------------------------------------------------
# Functional API + pipeline hook (api.py:26-131, __init__.py:7-66)
# ---------------------------------------------------------------------------

def smooth_video(frames_guide, frames_style, mode="Fast", window_size=15,
                 batch_size=8, tracking_window_size=0, minimum_patch_size=5,
                 num_iter=5, guide_weight=10.0, initialize="identity",
                 save_path=None):
    """Deflicker `frames_style` using `frames_guide` as motion guidance.

    Frames are HxWx3 uint8/float arrays (all the same shape); returns the
    blended frames as uint8 arrays.  Mirrors api.py:26-131 minus the
    gradio UI / ffmpeg output plumbing.
    """
    config = {
        "minimum_patch_size": minimum_patch_size,
        "num_iter": num_iter,
        "guide_weight": guide_weight,
        "initialize": initialize,
        "tracking_window_size": (0 if mode in ("Fast", "Balanced")
                                 else tracking_window_size),
    }
    runner = {"Fast": FastModeRunner, "Balanced": BalancedModeRunner,
              "Accurate": AccurateModeRunner}[mode]()
    return runner.run(frames_guide, frames_style, batch_size=batch_size,
                      window_size=window_size, ebsynth_config=config,
                      save_path=save_path)


def interpolate_video(frames_guide, keyframes, keyframe_indices,
                      batch_size=8, tracking_window_size=0,
                      minimum_patch_size=15, num_iter=5, guide_weight=10.0,
                      initialize="identity", save_path=None):
    """Propagate styled keyframes across a guide video (api.py:192-247)."""
    config = {
        "minimum_patch_size": minimum_patch_size,
        "num_iter": num_iter,
        "guide_weight": guide_weight,
        "initialize": initialize,
        "tracking_window_size": tracking_window_size,
    }
    runner = (InterpolationModeSingleFrameRunner if len(keyframes) == 1
              else InterpolationModeRunner)()
    return runner.run(frames_guide, keyframes, keyframe_indices,
                      batch_size=batch_size, ebsynth_config=config,
                      save_path=save_path)


class FastBlendSmoother:
    """Pipeline post-processing hook (FastBlend/__init__.py:7-66)."""

    def __init__(self):
        self.batch_size = 8
        self.window_size = 64
        self.ebsynth_config = _default_config()

    @staticmethod
    def from_model_manager(_model_manager=None):
        return FastBlendSmoother()

    def __call__(self, rendered_frames, original_frames=None, **kwargs):
        from PIL import Image

        if original_frames is None:
            raise ValueError(
                "FastBlendSmoother needs original_frames as the motion "
                "guide (the reference hook receives them from the video "
                "pipeline, FastBlend/__init__.py:55-58)")
        frames = FastModeRunner().run(
            [np.asarray(f) for f in original_frames],
            [np.asarray(f) for f in rendered_frames],
            batch_size=self.batch_size, window_size=self.window_size,
            ebsynth_config=self.ebsynth_config)
        return [Image.fromarray(f) for f in frames]

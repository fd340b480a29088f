"""Tiled-inference parity vs the reference FastTileWorker /
TileWorker2Dto3D (diffsynth/models/tiler.py:110-234)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.conftest import load_ref_module, requires_reference


@requires_reference
def test_tiled_forward_matches_fast_tile_worker():
    torch = pytest.importorskip("torch")
    ref = load_ref_module("models.tiler")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 40, 56, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    def fn_np(tile):  # shape-preserving nonlinear model
        return np.tanh(np.asarray(tile)) * 2.0 + 0.5

    want = ref.FastTileWorker().tiled_forward(
        lambda hl, hr, wl, wr: torch.tanh(xt[:, :, hl:hr, wl:wr]) * 2.0 + 0.5,
        xt, tile_size=16, tile_stride=12)

    from physicedit_tpu.extensions.tiler import tiled_forward

    got = tiled_forward(fn_np, jnp.asarray(x), tile_size=16, tile_stride=12)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1), atol=1e-5)


@requires_reference
def test_tiled_forward_3d_matches_2dto3d_worker():
    torch = pytest.importorskip("torch")
    ref = load_ref_module("models.tiler")

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 24, 32, 2)).astype(np.float32)  # B T H W C
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))          # B C T H W

    want = ref.TileWorker2Dto3D().tiled_forward(
        lambda t: t * 3.0 - 1.0, xt, tile_size=(16, 16),
        tile_stride=(8, 8), computation_device="cpu",
        computation_dtype=torch.float32)

    from physicedit_tpu.extensions.tiler import tiled_forward_3d

    got = tiled_forward_3d(lambda t: np.asarray(t) * 3.0 - 1.0,
                           jnp.asarray(x), tile_size=(16, 16),
                           tile_stride=(8, 8))
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 4, 1),
                               atol=1e-5)


def test_tiled_forward_scaling_model():
    """A 2x-upscaling, channel-doubling model blends into the right shape
    and reproduces the model output where tiles agree."""
    from physicedit_tpu.extensions.tiler import tiled_forward

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 32, 32, 2)).astype(np.float32)

    def up2(tile):
        t = np.repeat(np.repeat(np.asarray(tile), 2, 1), 2, 2)
        return np.concatenate([t, -t], -1)

    got = np.asarray(tiled_forward(up2, jnp.asarray(x), tile_size=16,
                                   tile_stride=8, scales=(2, 2, 2)))
    assert got.shape == (1, 64, 64, 4)
    np.testing.assert_allclose(got, up2(x), atol=1e-5)

"""Sequential video-processor chain (diffsynth/processors/).

Oracles: PIL ImageEnhance applied directly (PILEditor.py:5-32) and the
already-parity-tested RIFE smoother; registry/chaining semantics per
sequencial_processor.py:4-41.
"""

import numpy as np
import pytest
from PIL import Image, ImageEnhance

from physicedit_tpu.extensions import processors as procs


def _frames(n=4, size=24, seed=0):
    rng = np.random.default_rng(seed)
    return [Image.fromarray(rng.integers(0, 256, (size, size, 3),
                                         dtype=np.uint8))
            for _ in range(n)]


def test_pil_editors_match_reference_math():
    frames = _frames()
    contrast = procs.ContrastEditor(rate=1.3)(frames)
    sharp = procs.SharpnessEditor(rate=0.7)(frames)
    for src, got_c, got_s in zip(frames, contrast, sharp):
        np.testing.assert_array_equal(
            np.asarray(got_c),
            np.asarray(ImageEnhance.Contrast(src).enhance(1.3)))
        np.testing.assert_array_equal(
            np.asarray(got_s),
            np.asarray(ImageEnhance.Sharpness(src).enhance(0.7)))


def test_chain_runs_in_order_and_forwards_kwargs():
    calls = []

    class Stub(procs.VideoProcessor):
        def __init__(self, tag):
            self.tag = tag

        def __call__(self, rendered_frames, **kwargs):
            calls.append((self.tag, kwargs.get("marker")))
            return rendered_frames + [self.tag]

    chain = procs.SequencialProcessor([Stub("a"), Stub("b")])
    out = chain([], marker=7)
    assert out == ["a", "b"]
    assert calls == [("a", 7), ("b", 7)]


def test_from_configs_registry_dispatch_and_chain():
    chain = procs.SequencialProcessor.from_configs([
        {"processor_type": "Contrast", "config": {"rate": 1.2}},
        {"processor_type": "Sharpness", "config": {"rate": 1.1}},
    ])
    frames = _frames(n=2)
    got = chain(frames)
    want = [ImageEnhance.Sharpness(
        ImageEnhance.Contrast(f).enhance(1.2)).enhance(1.1) for f in frames]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_registry_rejects_unknown_type_and_missing_rife_weights():
    with pytest.raises(ValueError, match="invalid processor_type"):
        procs.make_processor("NotAThing")
    with pytest.raises(ValueError, match="RIFE"):
        procs.make_processor("RIFE")


def test_fastblend_config_forwarding():
    proc = procs.make_processor("FastBlend", batch_size=4, window_size=16,
                                num_iter=2)
    assert proc.batch_size == 4 and proc.window_size == 16
    assert proc.ebsynth_config["num_iter"] == 2


@pytest.mark.slow  # heavy e2e; fast siblings cover the module
def test_rife_smoother_in_chain_runs():
    import jax

    from physicedit_tpu.extensions import rife

    params = rife.init_ifnet_params(jax.random.PRNGKey(0), c=16)
    chain = procs.SequencialProcessor.from_configs(
        [{"processor_type": "RIFE",
          "config": {"batch_size": 2, "num_iter": 1}}],
        models={"rife": params})
    frames = _frames(n=4, size=32)
    out = chain(frames)
    assert len(out) == 4 and out[0].size == frames[0].size
    # endpoints pass through untouched (RIFE/__init__.py:200-242 semantics)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(frames[0]))
    # 48 px: non-/32 input exercises the round-up-to-/32 fix in
    # rife._process_images (the reference's own branch collapses such
    # frames to (w+31)//32 pixels and crashes — see the docstring there);
    # endpoint equality is only approximate through the resize round trip
    frames48 = _frames(n=4, size=48, seed=1)
    out48 = chain(frames48)
    assert len(out48) == 4 and out48[0].size == frames48[0].size

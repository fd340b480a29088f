"""Sweep drivers with a mock pipeline; ModelConfig resolution."""

import os

import numpy as np
import pytest
from PIL import Image

datasets = pytest.importorskip("datasets")


class MockPipe:
    def __init__(self):
        self.calls = []

    def __call__(self, prompt, edit_image=None, seed=None,
                 num_inference_steps=None, height=None, width=None,
                 edit_image_auto_resize=True, **kw):
        self.calls.append({"prompt": prompt, "h": height, "w": width,
                           "seed": seed})
        return Image.new("RGB", (width, height), (seed % 255, 0, 0))


def _fake_pica(tmp_path, n=3):
    rng = np.random.default_rng(0)
    recs = {
        "image": [Image.fromarray(rng.integers(0, 255, (70, 100, 3),
                                               dtype=np.uint8))
                  for _ in range(n)],
        "intermediate_prompt": [f"int {i}" for i in range(n)],
        "superficial_prompt": [f"sup {i}" for i in range(n)],
        "explicit_prompt": [f"exp {i}" for i in range(n)],
    }
    ds = datasets.Dataset.from_dict(recs)
    path = str(tmp_path / "pica_ds")
    ds.save_to_disk(path)
    return path


def test_pica_sweep_outputs_and_skip(tmp_path):
    from physicedit_tpu.eval.sweep import run_pica_sweep

    ds_path = _fake_pica(tmp_path)
    out_dir = str(tmp_path / "out")
    pipe = MockPipe()
    run_pica_sweep(pipe, out_dir, prompt_type="intermediate",
                   local_dataset_path=ds_path, seed=42,
                   num_inference_steps=2)
    files = sorted(os.listdir(out_dir))
    assert files == ["00000.jpg", "00001.jpg", "00002.jpg"]
    assert len(pipe.calls) == 3
    # Native sizes quantised to /32
    assert all(c["h"] % 32 == 0 and c["w"] % 32 == 0 for c in pipe.calls)
    assert pipe.calls[0]["prompt"] == "int 0"

    # restartability: second run skips everything
    pipe2 = MockPipe()
    run_pica_sweep(pipe2, out_dir, prompt_type="intermediate",
                   local_dataset_path=ds_path)
    assert pipe2.calls == []


def test_pica_index_sharding(tmp_path):
    from physicedit_tpu.eval.sweep import run_pica_sweep

    ds_path = _fake_pica(tmp_path)
    out_dir = str(tmp_path / "out2")
    pipe = MockPipe()
    run_pica_sweep(pipe, out_dir, start_idx=1, end_idx=2,
                   local_dataset_path=ds_path)
    assert sorted(os.listdir(out_dir)) == ["00001.jpg"]


def test_model_config_local_resolution(tmp_path):
    from physicedit_tpu.io.model_config import ModelConfig

    base = tmp_path / "models" / "Org" / "Model"
    (base / "vae").mkdir(parents=True)
    f = base / "vae" / "diffusion_pytorch_model.safetensors"
    f.write_bytes(b"x")
    cfg = ModelConfig(model_id="Org/Model",
                      origin_file_pattern="vae/*.safetensors",
                      local_model_path=str(tmp_path / "models"),
                      skip_download=True)
    assert cfg.download_if_necessary() == str(f)

    missing = ModelConfig(model_id="Org/Model",
                          origin_file_pattern="nope/*.safetensors",
                          local_model_path=str(tmp_path / "models"),
                          skip_download=True)
    with pytest.raises(FileNotFoundError):
        missing.download_if_necessary()


def test_find_model_files(tmp_path):
    from physicedit_tpu.cli.validate import find_model_files

    base = tmp_path / "Qwen" / "Qwen-Image"
    (base / "vae").mkdir(parents=True)
    (base / "vae" / "diffusion_pytorch_model.safetensors").write_bytes(b"x")
    hits = find_model_files(str(tmp_path))
    assert hits and hits[0].endswith("diffusion_pytorch_model.safetensors")


@pytest.mark.parametrize("mod", [
    "physicedit_tpu.cli.validate", "physicedit_tpu.cli.train",
    "physicedit_tpu.cli.generate", "physicedit_tpu.cli.inference_pica",
    "physicedit_tpu.cli.inference_kris",
])
def test_cli_help(mod, capsys):
    import importlib

    m = importlib.import_module(mod)
    with pytest.raises(SystemExit) as e:
        m.main(["--help"])
    assert e.value.code == 0
    assert "--" in capsys.readouterr().out


def test_pica_prompt_rewriter(tmp_path):
    from physicedit_tpu.eval.sweep import run_pica_sweep

    ds_path = _fake_pica(tmp_path)
    pipe = MockPipe()
    run_pica_sweep(pipe, str(tmp_path / "out3"), local_dataset_path=ds_path,
                   end_idx=1, prompt_rewriter=lambda p: p.upper())
    assert pipe.calls[0]["prompt"] == "INT 0"


class MockBatchPipe(MockPipe):
    def __init__(self):
        super().__init__()
        self.batch_calls = []

    def edit_batch(self, prompts, edit_images, height=None, width=None,
                   seeds=None, num_inference_steps=None, **kw):
        self.batch_calls.append({"n": len(prompts), "h": height, "w": width})
        return [Image.new("RGB", (width, height), (i, 0, 0))
                for i in range(len(prompts))]


class MockMixedPipe(MockBatchPipe):
    def __init__(self):
        super().__init__()
        self.mixed_calls = []

    def edit_batch_mixed(self, prompts, edit_images, heights=None,
                         widths=None, seeds=None, num_inference_steps=None,
                         **kw):
        self.mixed_calls.append({"n": len(prompts),
                                 "sizes": list(zip(widths, heights))})
        return [Image.new("RGB", (w, h), (i, 0, 0))
                for i, (w, h) in enumerate(zip(widths, heights))]


def test_make_prompt_rewriter_cmd():
    import sys

    from physicedit_tpu.cli.serving import make_prompt_rewriter

    assert make_prompt_rewriter(None) is None
    up = make_prompt_rewriter(
        f"{sys.executable} -c \"import sys; print(sys.stdin.read().upper())\"")
    assert up("hello world") == "HELLO WORLD"
    # failing command falls back to the original prompt
    bad = make_prompt_rewriter(f"{sys.executable} -c \"raise SystemExit(3)\"")
    assert bad("keep me") == "keep me"
    # nonexistent executable falls back too
    gone = make_prompt_rewriter("/nonexistent/rewriter")
    assert gone("still here") == "still here"


def test_serving_args_reach_the_sweep(tmp_path, monkeypatch):
    """The measured-best serving config is launchable from the CLI:
    --batch_size / --quantize / --prompt_rewriter_cmd flow through
    inference_pica.main into the sweep + pipeline construction."""
    import sys

    from physicedit_tpu.cli import inference_pica, serving

    seen = {}

    def fake_from_pretrained(paths, **kw):
        seen["quantize"] = kw.get("quantize")
        return MockPipe()

    def fake_sweep(pipe, out_dir, **kw):
        seen["batch_size"] = kw.get("batch_size")
        seen["rewriter"] = kw.get("prompt_rewriter")

    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline
    monkeypatch.setattr(PhysicEditPipeline, "from_pretrained",
                        staticmethod(fake_from_pretrained))
    import physicedit_tpu.eval.sweep as sweep_mod
    monkeypatch.setattr(sweep_mod, "run_pica_sweep", fake_sweep)
    inference_pica.main([
        "--base_model_path", str(tmp_path), "--output_dir", str(tmp_path),
        "--batch_size", "8", "--quantize", "int4",
        "--prompt_rewriter_cmd",
        f"{sys.executable} -c \"import sys; print(sys.stdin.read().upper())\"",
    ])
    assert seen["quantize"] == "int4"
    assert seen["batch_size"] == 8
    assert seen["rewriter"]("abc") == "ABC"

    # quantize + mesh sharding are alternative memory strategies
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--base_model_path", default=str(tmp_path))
    p.add_argument("--lora_path", default=None)
    p.add_argument("--tokenizer_path", default=None)
    serving.add_serving_args(p)
    args = p.parse_args(["--quantize", "int4", "--model_parallel", "2"])
    with pytest.raises(SystemExit):
        serving.build_pipeline(args)


def test_kris_cli_serving_args(tmp_path, monkeypatch):
    from physicedit_tpu.cli import inference_kris

    seen = {}
    from physicedit_tpu.pipeline.edit_pipeline import PhysicEditPipeline
    monkeypatch.setattr(PhysicEditPipeline, "from_pretrained",
                        staticmethod(lambda paths, **kw: MockPipe()))
    import physicedit_tpu.eval.sweep as sweep_mod
    monkeypatch.setattr(sweep_mod, "run_kris_sweep",
                        lambda pipe, out, **kw: seen.update(kw))
    inference_kris.main([
        "--base_model_path", str(tmp_path), "--output_dir", str(tmp_path),
        "--batch_size", "4",
    ])
    assert seen["batch_size"] == 4


def test_pica_sweep_batched_buckets(tmp_path):
    """batch_size>1 groups same-/32-bucket images into edit_batch calls;
    stragglers and odd buckets flush at the end."""
    from physicedit_tpu.eval.sweep import run_pica_sweep

    rng = np.random.default_rng(1)
    sizes = [(70, 100), (70, 100), (70, 100), (40, 64), (70, 100)]
    recs = {
        "image": [Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
                  for h, w in sizes],
        "intermediate_prompt": [f"p{i}" for i in range(len(sizes))],
        "superficial_prompt": [""] * len(sizes),
        "explicit_prompt": [""] * len(sizes),
    }
    ds = datasets.Dataset.from_dict(recs)
    path = str(tmp_path / "pica_b")
    ds.save_to_disk(path)
    out_dir = str(tmp_path / "outb")
    pipe = MockBatchPipe()
    run_pica_sweep(pipe, out_dir, local_dataset_path=path, batch_size=2,
                   num_inference_steps=2, mixed_resolution_batching=False)
    # 4x (96x64)-bucket images -> two batches of 2; 1x (64x32) straggler
    # flushes as a single __call__
    assert sorted(c["n"] for c in pipe.batch_calls) == [2, 2]
    assert len(pipe.calls) == 1
    assert len(os.listdir(out_dir)) == 5


def test_pica_sweep_mixed_resolution_batching(tmp_path):
    """The default native-res serving mode: items batch in ARRIVAL order
    across resolution buckets through edit_batch_mixed — full batches on a
    fragmented mix where per-bucket grouping degrades to singles."""
    from physicedit_tpu.eval.sweep import run_pica_sweep

    rng = np.random.default_rng(2)
    sizes = [(70, 100), (40, 64), (100, 70), (64, 40), (70, 100)]
    recs = {
        "image": [Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
                  for h, w in sizes],
        "intermediate_prompt": [f"p{i}" for i in range(len(sizes))],
        "superficial_prompt": [""] * len(sizes),
        "explicit_prompt": [""] * len(sizes),
    }
    ds = datasets.Dataset.from_dict(recs)
    path = str(tmp_path / "pica_m")
    ds.save_to_disk(path)
    out_dir = str(tmp_path / "outm")
    pipe = MockMixedPipe()
    run_pica_sweep(pipe, out_dir, local_dataset_path=path, batch_size=2,
                   num_inference_steps=2)
    # every flush is a FULL arrival-order batch (5 items -> 2+2, then the
    # final straggler drains through the same mixed path as a 1-batch)
    assert [c["n"] for c in pipe.mixed_calls] == [2, 2, 1]
    assert pipe.calls == [] and pipe.batch_calls == []
    # per-item native /32 sizes are preserved
    assert pipe.mixed_calls[0]["sizes"] == [(96, 64), (64, 32)]
    assert len(os.listdir(out_dir)) == 5

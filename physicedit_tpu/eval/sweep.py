"""Benchmark sweep drivers: PICABench and KRIS-Bench.

Rebuilds scripts/inference/inference_pica.py / inference_kris.py:
- PICA (inference_pica.py:217-303): HF `Andrew613/PICABench`, prompt_type
  in {superficial, intermediate, explicit}, edits at the input image's
  native size, index-range sharding across workers, outputs {idx:05d}.jpg,
- KRIS (inference_kris.py:118-190): HF `Liang0223/KRIS_Bench`, per-category
  output folders, inputs resized to ~1024-sq, idempotent skip of existing
  files (restartability).

Resolution bucketing: sweeps quantise sizes to /32 so XLA compiles a small
set of shapes instead of one per image (SURVEY.md section 7.4 item 3).
"""

from __future__ import annotations

import os

from physicedit_tpu.cli.validate import resize_image

PICA_PROMPT_COLUMNS = {
    "superficial": "superficial_prompt",
    "intermediate": "intermediate_prompt",
    "explicit": "explicit_prompt",
}


def _load_hf_dataset(name: str, split: str = "train", local_path: str | None = None):
    from datasets import load_dataset, load_from_disk

    if local_path is not None:
        return load_from_disk(local_path)
    return load_dataset(name, split=split)


class BucketBatcher:
    """Group sweep items into same-resolution batches for
    ``pipe.edit_batch`` (BASELINE config #5: batched serving).

    Items accumulate per /32-quantised (w, h) bucket; a bucket flushes
    when it reaches ``batch_size``.  ``flush_all`` drains stragglers (they
    run at whatever partial batch remains).  batch_size=1 degrades to the
    reference's one-image-per-invocation behaviour via ``pipe.__call__``.

    ``mixed=True`` (the native-resolution serving mode): items accumulate
    in ARRIVAL order into one queue and flush every ``batch_size`` items
    through ``pipe.edit_batch_mixed`` — conditioning batches across
    resolutions (its shapes are resolution-independent), the denoise runs
    per same-shape group inside.  Batch fill is 100% by construction even
    on a fully fragmented resolution mix, where per-bucket batching
    degrades toward single-item conditioning.
    """

    def __init__(self, pipe, batch_size: int, seed: int,
                 num_inference_steps: int, pipe_kwargs: dict | None = None,
                 mixed: bool = False):
        self.pipe = pipe
        self.batch_size = batch_size
        self.seed = seed
        self.steps = num_inference_steps
        # Extra kwargs forwarded to every pipe call (e.g. the opt-in
        # cfg_truncate_step serving accelerator)
        self.pipe_kwargs = dict(pipe_kwargs or {})
        self.mixed = mixed and batch_size > 1
        self.buckets: dict = {}

    def add(self, prompt, image, out_path, on_done):
        key = "mixed" if self.mixed else image.size
        self.buckets.setdefault(key, []).append((prompt, image, out_path, on_done))
        if len(self.buckets[key]) >= self.batch_size:
            self._flush(key)

    def _flush(self, key):
        items = self.buckets.pop(key, [])
        if not items:
            return
        if key == "mixed":
            outs = self.pipe.edit_batch_mixed(
                [p for p, _, _, _ in items], [im for _, im, _, _ in items],
                heights=[im.size[1] for _, im, _, _ in items],
                widths=[im.size[0] for _, im, _, _ in items],
                seeds=[self.seed] * len(items),
                num_inference_steps=self.steps, **self.pipe_kwargs)
            for out, (_, _, out_path, on_done) in zip(outs, items):
                on_done(out, out_path)
            return
        w, h = key
        if self.batch_size == 1 or len(items) == 1:
            prompt, image, out_path, on_done = items[0]
            out = self.pipe(prompt, edit_image=image, seed=self.seed,
                            num_inference_steps=self.steps, height=h, width=w,
                            edit_image_auto_resize=False, **self.pipe_kwargs)
            on_done(out, out_path)
            return
        outs = self.pipe.edit_batch(
            [p for p, _, _, _ in items], [im for _, im, _, _ in items],
            height=h, width=w, seeds=[self.seed] * len(items),
            num_inference_steps=self.steps, **self.pipe_kwargs)
        for out, (_, _, out_path, on_done) in zip(outs, items):
            on_done(out, out_path)

    def flush_all(self):
        for key in list(self.buckets):
            self._flush(key)


def run_pica_sweep(pipe, output_dir: str, prompt_type: str = "intermediate",
                   start_idx: int = 0, end_idx: int | None = None,
                   seed: int = 42, num_inference_steps: int = 40,
                   local_dataset_path: str | None = None,
                   native_resolution: bool = True,
                   skip_existing: bool = True,
                   prompt_rewriter=None,
                   batch_size: int = 1,
                   cfg_truncate_step: int | None = None,
                   mixed_resolution_batching: bool = True):
    """prompt_rewriter: optional callable prompt -> prompt, the injectable
    replacement for the reference's GPT-4o-mini rewriter
    (inference_pica.py:29-122; external API kept out of the framework).

    batch_size > 1 batches edits for serving.  With
    ``mixed_resolution_batching`` (default), native-resolution items batch
    their conditioning in arrival order across resolution buckets
    (pipe.edit_batch_mixed) — full batches even on PICA's fragmented
    native-size mix; set False to group whole edits per /32 bucket
    (pipe.edit_batch, the uniform-resolution mode)."""
    ds = _load_hf_dataset("Andrew613/PICABench", local_path=local_dataset_path)
    os.makedirs(output_dir, exist_ok=True)
    end_idx = len(ds) if end_idx is None else min(end_idx, len(ds))
    col = PICA_PROMPT_COLUMNS.get(prompt_type, prompt_type)

    def on_done(out, out_path):
        out.save(out_path)
        print(f"[PICA] -> {out_path}", flush=True)

    batcher = BucketBatcher(pipe, batch_size, seed, num_inference_steps,
                            pipe_kwargs={"cfg_truncate_step":
                                         cfg_truncate_step},
                            mixed=(mixed_resolution_batching
                                   and native_resolution))
    for idx in range(start_idx, end_idx):
        out_path = os.path.join(output_dir, f"{idx:05d}.jpg")
        if skip_existing and os.path.exists(out_path):
            continue
        rec = ds[idx]
        image = rec["image"].convert("RGB")
        if not native_resolution:
            image = resize_image(image)
        else:
            # quantise to /32 to bound the compile-cache size
            w = max(32, (image.size[0] // 32) * 32)
            h = max(32, (image.size[1] // 32) * 32)
            if (w, h) != image.size:
                image = image.resize((w, h))
        prompt = rec[col]
        if prompt_rewriter is not None:
            prompt = prompt_rewriter(prompt)
        batcher.add(prompt, image, out_path, on_done)
    batcher.flush_all()


def run_kris_sweep(pipe, output_dir: str, start_idx: int = 0,
                   end_idx: int | None = None, seed: int = 42,
                   num_inference_steps: int = 40,
                   local_dataset_path: str | None = None,
                   skip_existing: bool = True,
                   batch_size: int = 1,
                   cfg_truncate_step: int | None = None):
    ds = _load_hf_dataset("Liang0223/KRIS_Bench", local_path=local_dataset_path)
    os.makedirs(output_dir, exist_ok=True)
    end_idx = len(ds) if end_idx is None else min(end_idx, len(ds))

    def on_done(out, out_path):
        out.save(out_path)
        print(f"[KRIS] -> {out_path}", flush=True)

    batcher = BucketBatcher(pipe, batch_size, seed, num_inference_steps,
                            pipe_kwargs={"cfg_truncate_step":
                                         cfg_truncate_step})
    for idx in range(start_idx, end_idx):
        rec = ds[idx]
        category = rec.get("category", "default")
        cat_dir = os.path.join(output_dir, str(category))
        os.makedirs(cat_dir, exist_ok=True)
        name = rec.get("image_id", f"{idx:05d}")
        out_path = os.path.join(cat_dir, f"{name}.jpg")
        if skip_existing and os.path.exists(out_path):
            continue
        image = resize_image(rec["image"].convert("RGB"))
        prompt = rec.get("instruction", rec.get("prompt", ""))
        batcher.add(prompt, image, out_path, on_done)
    batcher.flush_all()

"""The pjit training step.

The reference's training loop (scripts/train/train_physicedit.py:652-688)
is: forward -> accelerator.backward (NCCL all-reduce) -> AdamW.  Here the
whole step is one jitted SPMD program: GSPMD shards the frozen DiT over the
`model` mesh axis and the batch over `data`; the gradient all-reduce is
inserted by the compiler (parallel/sharding.py).

AdamW + constant LR matches the reference optimizer
(train_physicedit.py:451-452).
"""

from __future__ import annotations

import functools

import jax
import optax

from physicedit_tpu.models.dit import DiTConfig
from physicedit_tpu.train.loss import physic_training_loss


def make_optimizer(lr: float = 1e-5, weight_decay: float = 1e-2,
                   gradient_accumulation_steps: int = 1):
    """AdamW + constant LR; micro-batch gradient accumulation via
    optax.MultiSteps (the Accelerate `accumulate` equivalent,
    train_physicedit.py:517,655)."""
    opt = optax.adamw(lr, weight_decay=weight_decay)
    if gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=gradient_accumulation_steps)
    return opt


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "optimizer", "t_min", "t_max", "attn_impl", "use_remat"),
    donate_argnames=("trainable", "opt_state"),
)
def train_step(
    trainable,          # {"lora": ..., "adapters": {...}} — the trained surface
    frozen,             # {"dit": frozen base params}
    opt_state,
    batch: dict,
    cfg: DiTConfig,
    optimizer,
    t_min: float,
    t_max: float,
    attn_impl: str = "xla",
    use_remat: bool = True,
):
    def loss_fn(tr):
        return physic_training_loss(
            tr, frozen, cfg, batch, t_min, t_max,
            attn_impl=attn_impl, use_remat=use_remat)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
    updates, opt_state = optimizer.update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    metrics["loss"] = loss
    return trainable, opt_state, metrics

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


def scale_by_adam_low_memory(b1: float = 0.9, b2: float = 0.999,
                             eps: float = 1e-8,
                             state_dtype=None) -> optax.GradientTransformation:
    """Adam with the moment buffers STORED in `state_dtype` (e.g. bf16).

    The moment update and the preconditioned step are computed in fp32
    every step; only the persisted m / v round through the low dtype.
    Halves (bf16) the optimizer-state HBM — the difference between a LoRA
    rank fitting one 16 GB chip or not (the reference trains r=128 on an
    80 GB A100, train_multigpu.sh:30-37; the trainable surface alone is
    ~944M params, so fp32 AdamW states cost 7.5 GB).

    state_dtype=None is exact fp32 Adam (matches optax.scale_by_adam).
    """
    import jax.numpy as jnp

    sdt = state_dtype

    def store(x):
        return x if sdt is None else x.astype(sdt)

    def init(params):
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=sdt or jnp.float32), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.copy, zeros))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        def upd(g, m, v):
            g = g.astype(jnp.float32)
            m_new = b1 * m.astype(jnp.float32) + (1 - b1) * g
            v_new = b2 * v.astype(jnp.float32) + (1 - b2) * g * g
            step = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
            return step, store(m_new), store(v_new)

        flat = jax.tree_util.tree_map(upd, grads, state.mu, state.nu)
        steps = jax.tree_util.tree_map(lambda t: t[0], flat,
                                       is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree_util.tree_map(lambda t: t[1], flat,
                                    is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[2], flat,
                                    is_leaf=lambda t: isinstance(t, tuple))
        return steps, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(lr: float = 1e-5, weight_decay: float = 1e-2,
                   gradient_accumulation_steps: int = 1,
                   state_dtype=None, name: str = "adamw"):
    """AdamW + constant LR; micro-batch gradient accumulation via
    optax.MultiSteps (the Accelerate `accumulate` equivalent,
    train_physicedit.py:517,655).  state_dtype stores the Adam moments in
    a low dtype (bf16) for large-rank LoRA on small-HBM chips.

    name="adafactor" swaps in Adafactor with a factored second moment and
    no first moment: optimizer state shrinks from 2x the trainable size
    to (rows+cols) per matrix — effectively free.  This is the one-chip
    answer to the reference's r=128 configuration (train_multigpu.sh:30-37,
    ~944M trainable params: fp32 AdamW states alone are 7.5 GB, bf16 ones
    3.8 GB; Adafactor's are ~8 MB), a documented divergence from the
    reference's AdamW — AdamW stays the default and the multi-chip mode.
    """
    if name == "adafactor":
        opt = optax.adafactor(
            learning_rate=lr,
            multiply_by_parameter_scale=False,  # LR is absolute, like AdamW
            clipping_threshold=1.0,
            weight_decay_rate=weight_decay * lr,  # decoupled decay per step
        )
    elif name != "adamw":
        raise ValueError(f"unknown optimizer {name!r} (adamw | adafactor)")
    elif state_dtype is None:
        opt = optax.adamw(lr, weight_decay=weight_decay)
    else:
        opt = optax.chain(
            scale_by_adam_low_memory(state_dtype=state_dtype),
            optax.add_decayed_weights(weight_decay),
            optax.scale(-lr),
        )
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

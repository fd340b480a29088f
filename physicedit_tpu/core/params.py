"""Parameter pytree helpers.

Models in this framework are pure functions over nested-dict parameter
pytrees.  Linear weights are stored in (in, out) layout so the forward pass
is a plain ``x @ w + b`` (one fewer transpose than torch's (out, in) layout,
and the natural layout for MXU-tiled matmuls).  The io/ converters transpose
torch checkpoints into this layout at load time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def linear(p, x):
    if "w_q" in p:  # int8 W8A8 path (ops/quant.py)
        from physicedit_tpu.ops.quant import int8_linear

        return int8_linear(p, x)
    if "w4" in p:  # packed-int4 W4A8 path (kernels/quant_matmul.py)
        from physicedit_tpu.kernels.quant_matmul import w4a8_linear

        return w4a8_linear(p, x)
    out = x @ p["w"]
    if "b" in p:
        out = out + p["b"]
    return out


def linear_init(key, d_in, d_out, dtype=jnp.float32, bias=True, std=None):
    """Torch-default init (kaiming-uniform bound 1/sqrt(d_in)) unless std given."""
    kw, kb = jax.random.split(key)
    if std is None:
        bound = 1.0 / np.sqrt(d_in)
        w = jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)
    else:
        w = jax.random.normal(kw, (d_in, d_out), jnp.float32) * std
    p = {"w": w.astype(dtype)}
    if bias:
        bound = 1.0 / np.sqrt(d_in)
        p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound).astype(dtype)
    return p


def zeros_linear(d_in, d_out, dtype=jnp.float32, bias=True):
    p = {"w": jnp.zeros((d_in, d_out), dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def stack_trees(trees):
    """Stack a list of identical pytrees along a new leading axis (layer axis)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def tree_size_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def random_tree_like(seed, shape_tree, int_low=-100, int_high=100):
    """Materialise a pytree of random arrays matching a ShapeDtypeStruct tree.

    Used to build benchmark weights for models too large to initialise in
    float (e.g. the 20B DiT is created directly in its quantized layout:
    ``jax.eval_shape`` the init+quantize composition, then fill).  Integer
    leaves get uniform ints, float leaves small positive values (so random
    quantization scales keep deep networks bounded).

    Int8 leaves are generated on-device as raw random bytes
    (``jax.random.bits`` at uint8 — every bit pattern is a valid int8 /
    packed nibble, and temps stay the size of the output; 32-bit RNG temps
    would fragment HBM exactly when the model barely fits).  The tunnelled
    host link (~1.4 GB/s) is far too slow to generate 10+ GB host-side.
    ``seed`` is an int or a jax PRNG key.
    """
    key = seed if hasattr(seed, "shape") else jax.random.PRNGKey(seed)
    leaves, treedef = jax.tree_util.tree_flatten(shape_tree)

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def _bytes(k, shape):
        return jax.random.bits(k, shape, jnp.uint8).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=1)
    def _scales(k, shape):
        return (jnp.abs(jax.random.normal(k, shape, jnp.float32)) * 1e-4
                + 1e-5)

    def fill(k, sd):
        if sd.dtype == jnp.int8:
            out = _bytes(k, sd.shape)
        elif jnp.issubdtype(sd.dtype, jnp.integer):
            out = jax.random.randint(k, sd.shape, int_low, int_high,
                                     jnp.int32).astype(sd.dtype)
        else:
            out = _scales(k, sd.shape).astype(sd.dtype)
        out.block_until_ready()
        return out

    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [fill(k, sd) for k, sd in zip(keys, leaves)])


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )

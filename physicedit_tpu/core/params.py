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


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )

"""Pair-axis chunking utilities.

TPU-native analog of the reference's serial `chunkify` memory bounding
(/root/reference/dqc/utils/mem.py): instead of a Python generator over 16 MiB
slices, we pad the leading axis and `lax.map` over fixed-size blocks so the
whole computation stays inside one compiled program with bounded peak memory.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def map_blocks(fn, args_tree, n: int, block: int):
    """Apply `fn` to fixed-size blocks of the leading axis.

    args_tree: pytree of arrays with leading dim n (only those; broadcast
    constants should be closed over in fn). Returns fn outputs concatenated
    over the leading axis, trimmed to n.

    Padding replicates the last row ("edge" mode): zero-padding would create
    invalid inputs (e.g. zero Gaussian exponents -> 0/0) whose NaN
    intermediates poison the *backward* pass even though the primal rows are
    sliced away.
    """
    if n <= block:
        return fn(args_tree)
    nb = -(-n // block)
    pad = nb * block - n

    def _pad(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, mode="edge")

    padded = jax.tree_util.tree_map(_pad, args_tree)
    reshaped = jax.tree_util.tree_map(
        lambda x: x.reshape((nb, block) + x.shape[1:]), padded)
    out = jax.lax.map(fn, reshaped)
    out = jax.tree_util.tree_map(
        lambda x: x.reshape((nb * block,) + x.shape[2:])[:n], out)
    return out


def map_reduce_blocks(fn, args_tree, n: int, block: int):
    """Like map_blocks but `fn` returns a per-block *reduction* (any pytree
    of arrays without the block axis); results are summed over blocks.
    Padded tail elements must contribute zero (pad inputs with zeros)."""
    if n <= block:
        return fn(args_tree)
    nb = -(-n // block)
    pad = nb * block - n

    def _pad(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    padded = jax.tree_util.tree_map(_pad, args_tree)
    reshaped = jax.tree_util.tree_map(
        lambda x: x.reshape((nb, block) + x.shape[1:]), padded)
    out = jax.lax.map(fn, reshaped)
    return jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), out)

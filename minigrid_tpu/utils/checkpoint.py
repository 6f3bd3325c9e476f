"""Checkpoint / resume for env states and training states.

The reference has no save/restore at all (SURVEY.md §5) — live Python
object graphs can only be pickled accidentally. Here every state is a
PyTree of arrays, so exact save/restore is a flat npz (or orbax for
sharded multi-host checkpoints).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save any PyTree of arrays to a single .npz (exact, host-side)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, __treedef__=np.frombuffer(str(treedef).encode(), np.uint8),
             **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load a PyTree saved by `save_pytree`, using `like` for structure.

    The treedef stored at save time must match `like`'s — loading a
    checkpoint into a differently-shaped structure silently reorders
    leaves, so it is an error here."""
    data = np.load(path)
    treedef = jax.tree.structure(like)
    stored = bytes(data["__treedef__"].tobytes()).decode()
    if stored != str(treedef):
        raise ValueError(
            "checkpoint treedef mismatch:\n"
            f"  saved: {stored}\n  like:  {treedef}"
        )
    # Return device arrays, not host numpy: restored states feed straight
    # back into step/rollout fns (incl. un-jitted eager use).
    leaves = [
        jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(treedef.num_leaves)
    ]
    return jax.tree.unflatten(treedef, leaves)


def save_orbax(path: str, tree: Any) -> None:
    """Sharding-aware checkpoint via orbax (multi-host safe)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)

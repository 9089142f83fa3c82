"""Checkpoint / resume: snapshot the whole sim as one pytree.

The reference has no checkpointing (SURVEY.md §5) — its closest artifact is
CSV logs. Because this framework keeps the entire simulation (plant,
onboard logic, estimators, radio rings, planner state, RNG keys) in one
immutable pytree, snapshots are nearly free: orbax when available, a
numpy .npz fallback otherwise. Restoring reproduces the run bit-exactly
(the PRNG key is part of the state).
"""

from __future__ import annotations

import pathlib

import jax
import numpy as np


def _flatten(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save(path, state):
    """Save any state pytree. Uses orbax if importable, else .npz."""
    path = pathlib.Path(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), state, force=True)
        ckptr.wait_until_finished()
        return "orbax"
    except Exception:
        leaves, _ = _flatten(state)
        np.savez_compressed(
            str(path) + ".npz",
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
        return "npz"


def restore(path, template):
    """Restore into the structure of `template` (same pytree shape)."""
    path = pathlib.Path(path)
    if path.exists() and path.is_dir():
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path.resolve(), target=template)
    npz = np.load(str(path) + ".npz")
    leaves, treedef = _flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = npz[f"leaf_{i}"]
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)

"""Checkpoint / resume of the SLAM state pytree.

The reference has no persistence at all (SURVEY.md §5 — state lives in RAM
and tracking collapse exit(0)s). Here the whole SlamState pytree (landmarks,
keyframe ring, graph edge matrices, temporal buffer, scale, counters)
checkpoints via orbax, enabling resume and multi-host restart.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save(path: str, state, step: int = 0) -> None:
    """Write a checkpoint of any pytree (orbax if present, npz fallback)."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path.absolute() / f"step_{step}", state, force=True)
        return
    except Exception:
        pass
    # npz fallback: flatten with treedef stored alongside.
    leaves, treedef = jax.tree.flatten(state)
    path.mkdir(parents=True, exist_ok=True)
    np.savez(path / f"step_{step}.npz",
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    (path / f"step_{step}.treedef").write_text(str(treedef))


def restore(path: str, example_state, step: int = 0):
    """Restore into the structure of ``example_state``."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(path.absolute() / f"step_{step}",
                                 item=example_state)
    except Exception:
        pass
    data = np.load(path / f"step_{step}.npz")
    leaves, treedef = jax.tree.flatten(example_state)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp
    new_leaves = [jnp.asarray(l) for l in new_leaves]
    return jax.tree.unflatten(treedef, new_leaves)

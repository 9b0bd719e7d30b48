"""Checkpoint / resume: serialise SLAM state pytrees.

The reference has no persistence at all (SURVEY §5: the keyframe database
is in-memory only, ``loop_closure.cpp:106-108``).  Long sequences need
resumable state: this module serialises any NamedTuple-of-arrays pytree
(``VoState``, ``MapState``, ``KeyframeDB``) plus the accumulated trajectory
to a single ``.npz`` with the tree structure recorded, so a run can stop
and resume mid-sequence.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np


def _flatten_with_names(tree: Any) -> tuple[list[tuple[str, np.ndarray]], Any]:
    leaves, treedef = jax.tree.flatten(tree)
    named = [(f"leaf_{i}", np.asarray(leaf)) for i, leaf in enumerate(leaves)]
    return named, treedef


def save_state(path: str | Path, **trees: Any) -> None:
    """Save named pytrees (e.g. ``vo=state, map=world_map``) to one .npz."""
    arrays: dict[str, np.ndarray] = {}
    manifest: dict[str, Any] = {}
    for name, tree in trees.items():
        named, treedef = _flatten_with_names(tree)
        manifest[name] = {
            "treedef": str(treedef),
            "n_leaves": len(named),
            "type": type(tree).__name__,
        }
        for key, arr in named:
            arrays[f"{name}.{key}"] = arr
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_state(path: str | Path, **templates: Any) -> dict[str, Any]:
    """Load pytrees saved by :func:`save_state`.

    ``templates`` supplies an example pytree per name (for the structure);
    returns a dict of reconstructed pytrees with device arrays.
    """
    path = Path(path)
    if not path.is_file():
        raise FileNotFoundError(f"Checkpoint not found: {path}")
    data = np.load(path)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    out: dict[str, Any] = {}
    for name, template in templates.items():
        if name not in manifest:
            raise KeyError(f"Checkpoint has no state named '{name}'")
        n = manifest[name]["n_leaves"]
        leaves = [jax.numpy.asarray(data[f"{name}.leaf_{i}"]) for i in range(n)]
        _, treedef = jax.tree.flatten(template)
        if treedef.num_leaves != n:
            raise ValueError(
                f"Template for '{name}' has {treedef.num_leaves} leaves, "
                f"checkpoint has {n}"
            )
        out[name] = jax.tree.unflatten(treedef, leaves)
    return out

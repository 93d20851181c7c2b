"""Checkpoint / resume — a capability upgrade over the reference, which never
persists weights (its "best model" is an in-memory state_dict copy,
/root/reference/training_cvs.py:230,330; see SURVEY.md §5).

Format: a single ``.npz`` of flattened leaves + a JSON treedef sidecar —
dependency-free, fast, and architecture-independent. An orbax-backed variant
is provided for async/production checkpointing when available.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _is_key(v: Any) -> bool:
    return hasattr(v, "dtype") and jax.dtypes.issubdtype(v.dtype, jax.dtypes.prng_key)


def _paths_of(tree: Any):
    """Key paths only — no leaf materialization (cheap on device trees)."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return ["/".join(str(p) for p in kp) for kp, _ in leaves_with_paths]


def _flatten_with_paths(tree: Any):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    paths = ["/".join(str(p) for p in kp) for kp, _ in leaves_with_paths]
    # typed PRNG keys serialize via their raw key data
    leaves = [
        np.asarray(jax.random.key_data(v)) if _is_key(v) else np.asarray(v)
        for _, v in leaves_with_paths
    ]
    return paths, leaves


def save(path: str, tree: Any, metadata: dict | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    paths, leaves = _flatten_with_paths(tree)
    np.savez(path, **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)})
    treedef = jax.tree_util.tree_structure(tree)
    side = {
        "paths": paths,
        "treedef": str(treedef),
        "metadata": metadata or {},
    }
    with open(path + ".json", "w") as f:
        json.dump(side, f)


def restore(path: str, like: Any) -> Any:
    """Restore into the structure of ``like``.

    Validated structurally: the stored key-path list (the treedef sidecar) is
    compared against ``like``'s paths, so two pytrees with identical leaf
    shapes in different structural positions cannot restore silently wrong —
    the first differing path is named in the error. Shapes/dtypes are then
    checked leaf-by-leaf.
    """
    z = np.load(path)
    leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
    ref_paths = _paths_of(like)
    ref_leaves, treedef = jax.tree_util.tree_flatten(like)
    try:
        with open(path + ".json") as f:
            stored_paths = json.load(f).get("paths")
    except FileNotFoundError:
        stored_paths = None
    if stored_paths is not None:
        for i, (sp, rp) in enumerate(zip(stored_paths, ref_paths)):
            if sp != rp:
                raise ValueError(
                    f"checkpoint structure mismatch at leaf {i}: stored path "
                    f"{sp!r} != expected {rp!r}"
                )
        if len(stored_paths) > len(ref_paths):
            raise ValueError(
                f"checkpoint has {len(stored_paths)} leaves, expected "
                f"{len(ref_paths)}; first unexpected stored path: "
                f"{stored_paths[len(ref_paths)]!r}"
            )
        if len(stored_paths) < len(ref_paths):
            raise ValueError(
                f"checkpoint has {len(stored_paths)} leaves, expected "
                f"{len(ref_paths)}; first missing path: "
                f"{ref_paths[len(stored_paths)]!r}"
            )
    if len(leaves) != len(ref_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, expected {len(ref_leaves)}"
        )
    out = []
    for i, (a, b) in enumerate(zip(leaves, ref_leaves)):
        if _is_key(b):
            out.append(jax.random.wrap_key_data(a, impl=jax.random.key_impl(b)))
            continue
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"leaf {i} ({ref_paths[i]}) shape {a.shape} != expected {np.shape(b)}"
            )
        out.append(a)
    return jax.tree_util.tree_unflatten(treedef, out)


def host_rng_tree(rng: "np.random.RandomState") -> dict:
    """Snapshot a numpy RandomState as plain arrays (checkpointable), so
    host-side shuffling resumes batch-exactly (the reference cannot resume at
    all; SURVEY.md §5)."""
    kind, keys, pos, has_gauss, cached = rng.get_state()
    assert kind == "MT19937", kind
    return {
        "mt_keys": np.asarray(keys, dtype=np.uint32),
        "pos": np.asarray(pos, dtype=np.int64),
        "has_gauss": np.asarray(has_gauss, dtype=np.int64),
        "cached_gaussian": np.asarray(cached, dtype=np.float64),
    }


def apply_host_rng_tree(rng: "np.random.RandomState", tree: dict) -> None:
    rng.set_state(
        (
            "MT19937",
            np.asarray(tree["mt_keys"], dtype=np.uint32),
            int(tree["pos"]),
            int(tree["has_gauss"]),
            float(tree["cached_gaussian"]),
        )
    )


def load_metadata(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f).get("metadata", {})


def save_orbax(path: str, tree: Any) -> None:
    """Orbax-backed checkpoint (async-capable, multi-host-aware)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)


def restore_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=like)

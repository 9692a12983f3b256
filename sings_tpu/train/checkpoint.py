"""Checkpointing: full training state as a single npz of flattened paths.

Covers the reference's checkpoint contract (sings_hybrid.py:169-237):
params, per-gaussian buffers, full Adam state, step counter, and
active SH degree. Buffers are padded static arrays + alive mask, so
shapes are stable across densify/prune — resume never needs the
reference's shape-mismatch fallback.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str, out: dict):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[f"{prefix}__treedef"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}__{i}"] = np.asarray(leaf)


def _unflatten(template: Any, prefix: str, data) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    for i, tmpl_leaf in enumerate(leaves):
        arr = data[f"{prefix}__{i}"]
        tmpl_shape = jnp.shape(tmpl_leaf)
        if arr.shape != tmpl_shape:
            # e.g. a checkpoint written at a different gaussian capacity
            # (reference handles this with a graceful fallback,
            # sings_hybrid.py:201-237 — we surface it to the caller)
            raise CheckpointShapeMismatch(
                f"{prefix} leaf {i}: checkpoint {arr.shape} vs "
                f"current {tmpl_shape}")
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class CheckpointShapeMismatch(ValueError):
    """Checkpoint arrays don't match the current model configuration."""


def save_checkpoint(path: str, *, params, buffers, opt_state, step: int,
                    active_sh_degree: int, extra: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    out: dict = {
        "step": np.asarray(step),
        "active_sh_degree": np.asarray(active_sh_degree),
    }
    _flatten(params, "params", out)
    _flatten(buffers, "buffers", out)
    _flatten(opt_state, "opt", out)
    if extra:
        for k, v in extra.items():
            out[f"extra__{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **out)
    os.replace(tmp, path)


def load_checkpoint(path: str, *, params_template, buffers_template,
                    opt_template):
    data = np.load(path, allow_pickle=False)
    params = _unflatten(params_template, "params", data)
    buffers = _unflatten(buffers_template, "buffers", data)
    opt_state = _unflatten(opt_template, "opt", data)
    extra = {
        k[len("extra__"):]: data[k] for k in data.files
        if k.startswith("extra__")
    }
    return {
        "params": params,
        "buffers": buffers,
        "opt_state": opt_state,
        "step": int(data["step"]),
        "active_sh_degree": int(data["active_sh_degree"]),
        "extra": extra,
    }


def latest_checkpoint(ckpt_dir: str, pattern: str = "human_") -> str | None:
    """Auto-resume discovery (reference gs_trainer.py:120-125)."""
    if not os.path.isdir(ckpt_dir):
        return None
    files = sorted(
        f for f in os.listdir(ckpt_dir)
        if f.startswith(pattern) and f.endswith(".npz")
    )
    return os.path.join(ckpt_dir, files[-1]) if files else None

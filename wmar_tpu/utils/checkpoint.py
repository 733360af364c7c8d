"""Param pytree IO + the reference's weight-delta checkpoint format.

The reference publishes RCC finetune results as *deltas* against the frozen
originals and patches them in additively at load time
(``wmar/utils/utils.py:47-66,215-227``; ``README.md:81-96``). Deltas are
plain pytree arithmetic here.

Serialization uses flax msgpack (`.msgpack`) — no pickle, portable across
hosts/devices.
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization
import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(tree)))


def load_pytree(path: str, like: Any) -> Any:
    """Load into the structure of ``like`` (shapes/dtypes validated)."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(like, f.read())


def compute_delta(new_tree: Any, orig_tree: Any) -> Any:
    """new - orig, per leaf (the published finetune artifact format)."""
    return jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), new_tree, orig_tree)


def apply_delta(orig_tree: Any, delta_tree: Any) -> Any:
    """orig + delta, per leaf (reference ``update_weights(delta=True)``)."""
    return jax.tree.map(lambda a, d: a + d, orig_tree, delta_tree)


def save_delta(path: str, new_tree: Any, orig_tree: Any) -> None:
    save_pytree(path, compute_delta(new_tree, orig_tree))


def load_and_apply_delta(path: str, orig_tree: Any) -> Any:
    delta = load_pytree(path, jax.tree.map(np.asarray, orig_tree))
    return apply_delta(orig_tree, delta)

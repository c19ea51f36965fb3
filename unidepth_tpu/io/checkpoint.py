"""Checkpoint save/resume (reference scripts/train.py:150-161 semantics:
model + optimizer state + step counter), built on orbax.

The reference never *writes* checkpoints in-loop (SURVEY.md §5); here
training emits restartable snapshots — params, optimizer state, EMA
shadow, and step. States are stored as flattened leaf lists and restored
against the caller's template treedef, so NamedTuple/custom-node
structures survive the round-trip.
"""

from __future__ import annotations

from pathlib import Path

import jax

__all__ = ["save_checkpoint", "load_train_checkpoint", "save_params", "load_params"]


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, state, step: int) -> str:
    path = Path(directory).absolute() / f"step_{step:08d}"
    leaves = jax.tree.leaves(state)
    _ckptr().save(
        path,
        {"leaves": [jax.device_get(x) for x in leaves], "step": step},
        force=True,
    )
    return str(path)


def load_train_checkpoint(path: str, template):
    restored = _ckptr().restore(Path(path).absolute())
    treedef = jax.tree.structure(template)
    state = jax.tree.unflatten(treedef, restored["leaves"])
    return state, int(restored["step"])


def save_params(directory: str, params) -> str:
    path = Path(directory).absolute()
    _ckptr().save(path, jax.device_get(params), force=True)
    return str(path)


def load_params(directory: str):
    return _ckptr().restore(Path(directory).absolute())

"""Sweep-state checkpoint / resume (orbax).

The reference has no checkpointing (SURVEY.md §5 — its only persisted
artifact is the CppAD codegen cache, whose role the XLA compilation cache
plays here).  Pod-scale scenario sweeps do need it: a 10k-scenario domain
sweep interrupted at step k resumes from the saved loop-state pytree.
"""
from __future__ import annotations

import os
from typing import Any

import jax


def save_sweep_state(path: str, state: Any, step: int):
    """Persist a (possibly sharded) loop-state pytree."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, f"step_{step}"), state, force=True)
    ckpt.wait_until_finished()


def restore_sweep_state(path: str, abstract_state: Any, step: int | None = None):
    """Restore; `abstract_state` provides shapes/shardings (e.g. the freshly
    initialized pytree).  If step is None, the latest step_* dir is used."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_")
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.join(path, f"step_{step}"), abstract_state), step

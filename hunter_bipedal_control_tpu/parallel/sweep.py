"""Scenario-sweep scaling: mesh construction + sharded batched solves.

The TPU scaling axis absent from the single-robot reference (SURVEY.md
§2.2 "Scenario batching"): thousands of (initial state, command, gait)
scenarios run as one batched MPC/WBC program, the batch dimension sharded
over the device mesh so each chip solves its shard and collectives only
appear for cross-scenario reductions (telemetry means/maxima).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int] = None, axis_names: Sequence[str] = ("data",)):
    """Build a device mesh.  Default: all devices on one 'data' axis."""
    devs = np.array(jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devs),)
    return Mesh(devs.reshape(tuple(axis_sizes)), axis_names)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a batch-leading pytree with its leading axis sharded over
    ``axis`` of the mesh."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_solve_fn(solve_one, mesh: Mesh, axis: str = "data"):
    """vmap + jit a per-scenario solve with batch-sharded inputs/outputs.

    ``solve_one(*args)``: pure per-scenario function.  Returns a jitted
    function expecting batch-leading args already placed via shard_batch
    (or letting jit insert the transfer)."""
    batched = jax.vmap(solve_one)
    shard = NamedSharding(mesh, P(axis))
    return jax.jit(batched, in_shardings=shard, out_shardings=shard)


def sweep_summary(metrics: jnp.ndarray):
    """Cross-shard reduction example: mean/max over the sharded batch —
    XLA inserts the ICI collectives."""
    return {"mean": metrics.mean(), "max": metrics.max(), "min": metrics.min()}

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


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding a leading batch axis over ALL mesh axes —
    works for the 1-axis ('data',) mesh and the multi-host
    ('host','device') mesh alike."""
    return P(tuple(mesh.axis_names))


def psum_telemetry(metrics_tree, mesh: Mesh):
    """Explicit-collective telemetry reduction: shard_map over every mesh
    axis, per-shard partial sums, one `psum` riding ICI/DCN per leaf.
    Returns replicated means — the cross-host reduction path for pod-scale
    domain sweeps (TPU-native analog of the reference's ROS telemetry
    aggregation, SURVEY.md §2.2 'Distributed backend')."""
    from jax.experimental.shard_map import shard_map

    names = tuple(mesh.axis_names)
    spec = batch_spec(mesh)

    def reduce_shard(tree):
        def one(x):
            s = jnp.sum(x, axis=0, keepdims=True)
            n = jnp.full((1,), x.shape[0], jnp.float32)
            s = jax.lax.psum(s, names)
            n = jax.lax.psum(n, names)
            return (s / n)[0]

        return jax.tree.map(one, tree)

    fn = shard_map(reduce_shard, mesh=mesh,
                   in_specs=(jax.tree.map(lambda _: spec, metrics_tree),),
                   out_specs=jax.tree.map(lambda _: P(), metrics_tree))
    return jax.jit(fn)(metrics_tree)

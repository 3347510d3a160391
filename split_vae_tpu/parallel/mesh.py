"""Mesh construction and sharding rules.

The reference is strictly single-device (SURVEY.md 2.3: no tf.distribute
anywhere). TPU-native scaling story:
  - 'data' axis: batch sharded, params replicated; XLA's SPMD partitioner
    inserts the gradient all-reduce over ICI automatically.
  - 'model' axis (optional): large Dense/Conv kernels sharded on their output
    feature dim; activations stay replicated and XLA inserts the needed
    collectives. At reference model sizes (<10M params) this is off by
    default (mesh shape (ndev, 1)) but the full path is exercised by
    ``dryrun_multichip``.

Multi-host pods: call ``jax.distributed.initialize()`` before ``create_mesh``
and the same code lays the mesh over all processes (DCN between hosts, ICI
within a slice).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: call once per process before ``create_mesh``.

    On TPU pods with standard env vars ``jax.distributed.initialize()`` needs
    no arguments; an explicit ``coordinator`` (host:port) with
    ``num_processes``/``process_id`` supports DCN clusters. No-op if already
    initialized, or when nothing requests multi-process (no coordinator and
    num_processes in (None, 0, 1)). The request check is pure Python and runs
    FIRST: querying jax.process_count() would itself initialize the local
    backend, which must not happen before jax.distributed.initialize.
    """
    if coordinator is None and (num_processes or 1) <= 1:
        return  # nothing requested multi-process; don't touch backends
    try:
        if coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif (num_processes or 1) > 1:
            # TPU pod: the runtime env supplies coordinator/process info.
            jax.distributed.initialize()
    except RuntimeError:
        pass  # already initialized


def create_mesh(num_data: int = 0, num_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. num_data=0 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data <= 0:
        num_data = max(1, len(devices) // num_model)
    use = num_data * num_model
    grid = np.asarray(devices[:use]).reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, split along the leading dim."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def infer_param_sharding(params, mesh: Mesh, min_size: int = 1 << 15):
    """Tensor-parallel rule: shard big kernels' output-feature dim over 'model'.

    Leaves smaller than ``min_size`` elements, or whose last dim does not
    divide evenly, stay replicated. With a (N, 1) mesh this returns pure
    replication (classic DP).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def rule(x):
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.size >= min_size
            and x.shape[-1] % n_model == 0
        ):
            spec = [None] * (x.ndim - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: params (and mirrored opt state) per the
    tensor-parallel rule, everything else replicated.

    Optimizer-state placement is STRUCTURAL: ``optax.tree_map_params`` walks
    ``state.opt_state`` with the param treedef, so every params-shaped leaf
    (Adam mu/nu, momentum traces, ...) receives exactly its param's sharding
    — no path-string matching, no ambiguity across nested sub-states. Scalar
    bookkeeping leaves (step counts, schedule states) are replicated.
    """
    param_shardings = infer_param_sharding(state.params, mesh)
    params = jax.tree.map(jax.device_put, state.params, param_shardings)

    repl = NamedSharding(mesh, P())
    opt_state = optax.tree_map_params(
        state.tx,
        lambda leaf, sharding: jax.device_put(leaf, sharding),
        state.opt_state,
        param_shardings,
        transform_non_params=lambda leaf: jax.device_put(leaf, repl),
    )

    rng = jax.device_put(state.rng, repl)
    step = jax.device_put(state.step, repl)
    batch_stats = (
        jax.tree.map(lambda x: jax.device_put(x, repl), state.batch_stats)
        if state.batch_stats is not None
        else None
    )
    return state.replace(
        params=params, opt_state=opt_state, rng=rng, step=step, batch_stats=batch_stats
    )

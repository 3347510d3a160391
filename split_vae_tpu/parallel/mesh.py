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

import threading
from typing import Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_distributed_initialized = False


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

    A genuine init failure (unreachable coordinator, port clash, bad
    process_id) PROPAGATES — only the already-initialized condition is
    swallowed, so a misconfigured pod job fails loudly instead of silently
    proceeding single-process.
    """
    global _distributed_initialized
    if coordinator is None and (num_processes or 1) <= 1:
        return  # nothing requested multi-process; don't touch backends
    if _distributed_initialized:
        return
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
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
    _distributed_initialized = True


def create_mesh(num_data: int = 0, num_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. num_data=0 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data <= 0:
        num_data = max(1, len(devices) // num_model)
    use = num_data * num_model
    grid = np.asarray(devices[:use]).reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


_ambient_tls = threading.local()  # per-thread set_mesh record for the mesh WE installed


def activate_mesh(mesh: Mesh) -> Mesh:
    """Install ``mesh`` as JAX's ambient mesh for this thread.

    Opaque custom calls (the fused Pallas renderer) cannot be partitioned by
    XLA's SPMD pass; their wrappers instead read the ambient mesh at TRACE
    time (``ambient_data_axis_size``) and shard_map themselves over the batch
    axis. Train loops call this right after ``create_mesh`` so every jitted
    step traced afterwards sees the session's mesh — no mutable framework
    global, just JAX's own thread-local mesh context.

    A 1-device mesh is deliberately NOT installed: nothing needs shard_map
    there, and an ambient mesh context changes the traced/compiled program
    (SPMD pass in the pipeline) even when it is semantically a no-op —
    single-chip training should stay byte-identical to the unmeshed trace.
    Any mesh previously installed by this function IS cleared first, so a
    single-device train/eval after a sharded run in the same process traces
    without the stale multi-device mesh (its fused render would otherwise
    shard_map over devices the batch is not placed on).
    """
    record = getattr(_ambient_tls, "record", None)
    if record is not None:
        # Restore the pre-install ambient state before installing anew;
        # set_mesh records prev context, so exiting undoes OUR install only.
        # The record is thread-local because set_mesh mutates jax's
        # thread-local device context — exiting another thread's record
        # would clobber the wrong thread's mesh.
        record.__exit__(None, None, None)
        _ambient_tls.record = None
    if mesh.devices.size > 1:
        _ambient_tls.record = jax.sharding.set_mesh(mesh)
    return mesh


def ambient_data_axis_size() -> int:
    """Size of the ambient mesh's 'data' axis (1 when no mesh is active).

    Safe to call at trace time inside jit: the abstract mesh is part of the
    trace context, so the branch taken is baked into the compiled program.
    """
    am = jax.sharding.get_abstract_mesh()
    if am is None:
        return 1
    return dict(am.shape).get(DATA_AXIS, 1)


def ambient_mesh():
    """The ambient (abstract) mesh, or None when none is active/empty."""
    am = jax.sharding.get_abstract_mesh()
    if am is None or not am.shape:
        return None
    return am


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, split along the leading dim."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def put_global_batch(batch, sharding: NamedSharding):
    """Place a host batch on a (possibly multi-process) sharding.

    Single-process: plain ``device_put``. Multi-process: each host holds only
    ITS slice of the global batch (the loader's per-host disjoint shard), so
    the global array is assembled with
    ``jax.make_array_from_process_local_data`` — host k's rows land on host
    k's devices, and the global (leading) dim is ``local rows x num hosts``.
    """
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch)
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
    repl = NamedSharding(mesh, P())
    opt_shardings = optax.tree_map_params(
        state.tx,
        lambda leaf, sharding: sharding,
        state.opt_state,
        param_shardings,
        transform_non_params=lambda leaf: repl,
    )

    if jax.process_count() > 1:
        # Multi-process: device_put cannot target non-addressable devices.
        # Every process holds the SAME host state (same init seed), so a jit
        # identity with out_shardings assembles the global arrays — the SPMD
        # runtime scatters each process's replica onto its own devices.
        shardings = state.replace(
            params=param_shardings,
            opt_state=opt_shardings,
            rng=repl,
            step=repl,
            batch_stats=(
                jax.tree.map(lambda _: repl, state.batch_stats)
                if state.batch_stats is not None else None),
        )
        return jax.jit(lambda s: s, out_shardings=shardings)(state)

    params = jax.tree.map(jax.device_put, state.params, param_shardings)
    opt_state = jax.tree.map(jax.device_put, state.opt_state, opt_shardings)
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

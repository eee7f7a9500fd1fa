"""Device-mesh utilities for data-parallel training (jax.sharding).

The reference's entire distributed story is NCCL DDP + ``reduce_mean`` on
EMA buffers (SURVEY.md §2.4). The TPU-native equivalent: a 1-D device mesh,
``shard_map`` over the batch axis with ``lax.pmean`` for gradients and the
EMA normalizers (already inside the train steps via ``axis_name``), ICI
collectives within a slice and DCN between slices — all emitted by XLA from
the sharding annotations.

Both application suites consume these helpers (``sixdof.main`` /
``det.main`` wrap their train steps with :func:`data_parallel_step`).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = 'data') -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f'need {n_devices} devices, have {len(devices)}')
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = 'data') -> Any:
    """Place a host batch sharded along its leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree replicated on every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree)


def data_parallel_infer(infer_fn, mesh: Mesh, axis_name: str = 'data',
                        n_batch_args: int = 7):
    """Wrap a serving ``infer(variables, *batch_args, rng)`` in shard_map.

    The TPU-native counterpart of the reference's multi-GPU dist test
    (tools/dist_test.sh spawning one ``single_gpu_test`` per rank): the
    image batch shards along its leading axis, parameters and the rng
    replicate, and per-shard results concatenate back on the leading
    axis (inference has no cross-image dependencies, so no collectives
    are emitted). Per-image batch size must divide by the mesh size.
    """
    batch_specs = (P(axis_name),) * n_batch_args
    return jax.jit(shard_map(
        infer_fn, mesh=mesh,
        in_specs=(P(),) + batch_specs + (P(),),
        out_specs=P(axis_name),
        check_vma=False))


def data_parallel_step(step_fn, mesh: Mesh, batch_example: Any,
                       axis_name: str = 'data'):
    """Wrap ``step_fn(state, batch, rng) -> (state, metrics)`` in shard_map.

    The batch shards along its leading axis; state and rng replicate; the
    step function must already ``pmean`` its gradients/EMA over
    ``axis_name`` (both suites' ``make_train_step(axis_name=...)`` do).
    """
    batch_spec = jax.tree_util.tree_map(lambda _: P(axis_name),
                                        batch_example)
    return jax.jit(shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False))

"""Device mesh + sharding helpers.

The reference scales with one strategy — data parallelism over NCCL DDP
(SURVEY.md §2.7, apis/train.py:227-231).  The TPU-native equivalent is a 1-D
``Mesh(('data',))`` with batch-sharded inputs and replicated parameters;
XLA/GSPMD inserts the gradient all-reduces over ICI automatically when a
jitted train step consumes sharded batches with replicated params (no psum
calls to write by hand).  Multi-slice DCN meshes compose by reshaping
``jax.devices()`` before calling ``create_mesh``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices=None, axis_name="data"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh, batch, axis_name="data"):
    """Place a host batch dict on the mesh, sharded along the batch dim."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def shard_host_local_batch(mesh, batch, axis_name="data"):
    """Build global device arrays from each host's LOCAL shard of the batch.

    Multi-host counterpart of ``shard_batch`` (the reference's
    DistributedGroupSampler rank split, samplers/group_sampler.py): every
    host holds only its ``host_local_slice`` of the global batch; JAX
    assembles the logical global array across processes.  With one process
    this reduces to ``shard_batch``.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def replicate(mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh, axis_name="data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())

"""Multi-host launch support.

Counterpart of the reference's torch.distributed launchers
(tools/dist_train.sh / slurm_train.sh, NNODES/NODE_RANK env,
SURVEY.md §2.7): JAX's multi-controller model needs one
``jax.distributed.initialize`` per host; afterwards ``jax.devices()`` spans
the whole slice/pod and the same 1-D data mesh program runs unchanged
(GSPMD shards the global batch and rides gradients over ICI, with DCN
between slices for multislice jobs).

On Cloud TPU pods the coordinator/process env is auto-detected; for manual
clusters pass coordinator_address/num_processes/process_id or set
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.

Per-host data sharding: each host feeds only its local shard of the global
batch; ``host_local_slice`` gives the index range the loader should produce
(the replacement for the reference's DistributedGroupSampler rank split).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize multi-host JAX. No-op for single-process runs."""
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    if coordinator_address is None and env_n is None:
        # single host or auto-detected TPU pod environment
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        return True
    if coordinator_address is None:
        coordinator_address = os.environ["JAX_COORDINATOR_ADDRESS"]
    if num_processes is None:
        num_processes = int(env_n)
    if process_id is None:
        # NOTE: must be an `is None` check — `process_id or env[...]`
        # would misroute RANK 0 (falsy) to the env var
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_local_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of a globally-indexed batch."""
    n = jax.process_count()
    i = jax.process_index()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} hosts"
    )
    per = global_batch_size // n
    return i * per, per

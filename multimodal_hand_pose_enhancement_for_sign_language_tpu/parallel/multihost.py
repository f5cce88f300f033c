"""Multi-host (DCN) scale-out helpers.

The reference is strictly single-node (SURVEY §2: Pool(24) +
nn.DataParallel).  TPU pods span hosts: collectives ride ICI inside a
slice, and each host feeds only its local shard of the batch.  These
helpers wrap that pattern:

  * `initialize()`          — jax.distributed bootstrap (no-op when the
    env provides no coordinator, e.g. single-host runs),
  * `local_batch_slice(n)`  — the [start, stop) rows of a global batch
    this host is responsible for,
  * `global_batch_array(x)` — assemble a globally-sharded array from
    host-local data via make_array_from_process_local_data.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None, **kwargs) -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Returns True if multi-process mode is active.  Controlled by the
    standard env vars (JAX_COORDINATOR_ADDRESS etc.) or explicit args;
    silently stays single-process otherwise.

    NB: must run before anything initializes the XLA backend, so this
    function deliberately makes NO jax calls (not even process_count)
    until after jax.distributed.initialize.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    try:
        jax.distributed.initialize(coordinator_address=addr, **kwargs)
    except RuntimeError as e:
        # idempotent re-entry is fine; any other bootstrap failure must
        # surface — silently degrading to single-process would train
        # independent replicas per host
        if "already" not in str(e).lower():
            raise
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> slice:
    """Rows of the global batch owned by this host (equal host split)."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} must divide across {n_proc} hosts"
        )
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch_array(local_rows: np.ndarray, mesh: Mesh, axis: str = "data"):
    """Host-local rows -> one global jax.Array sharded along `axis`.

    Each host passes only its own slice (see local_batch_slice); the
    result behaves like a normal sharded array under jit, with gradient
    reductions riding ICI/DCN as XLA chooses.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_rows)

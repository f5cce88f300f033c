"""Mesh construction and batch sharding.

The reference's only multi-device mechanisms are nn.DataParallel
(inference.py:45-47) and CPU process pools; here data parallelism is SPMD:
a 1-D (or 2-D data x model) `jax.sharding.Mesh`, inputs sharded along
'data' with NamedSharding, parameters replicated.  Under `jit`, XLA then
inserts the gradient all-reduce over ICI automatically — the TPU-native
replacement for DataParallel's scatter/gather and for `lax.pmean` pmap
code.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the first n_devices devices."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    data_axis = n // model_axis
    dev_array = np.asarray(devices[: data_axis * model_axis]).reshape(
        data_axis, model_axis
    )
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place an array with its leading axis split along 'data'."""
    return jax.device_put(x, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return int(math.ceil(n / k) * k)

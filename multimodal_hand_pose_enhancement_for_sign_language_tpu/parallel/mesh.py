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


def act_constraint(x, mesh: Mesh):
    """`with_sharding_constraint` for an activation inside jit: batch over
    'data'; channels (last dim) over 'model' when they divide.  This is
    the anchor that makes tensor parallelism REAL — without it XLA is
    free to all-gather tp-sharded params and run effectively DP."""
    model = mesh.shape.get("model", 1)
    spec = ["data"] + [None] * (x.ndim - 1)
    if model > 1 and x.ndim >= 2 and x.shape[-1] % model == 0:
        spec[-1] = "model"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def tp_param_placement(tree, mesh: Mesh):
    """Place conv kernels (flax (k, in, out)) with the output-channel dim
    sharded over 'model' where it divides; everything else replicated."""
    model = mesh.shape.get("model", 1)

    def put(a):
        if getattr(a, "ndim", 0) == 3 and model > 1 and a.shape[-1] % model == 0:
            return jax.device_put(a, NamedSharding(mesh, P(None, None, "model")))
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)

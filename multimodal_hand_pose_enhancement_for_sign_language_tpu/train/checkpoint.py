"""Checkpoint persistence.

Keeps the reference's checkpoint *semantics* (train_gan.py:353-370):
best-val generator -> `{exp}_checkpoint.pkl`, discriminator ->
`discriminator_{exp}.pkl`, final copy -> `lastCheckpoint_{exp}.pkl`, each
a dict {epoch, state_dict(pytree), optimizer state}.  Stored as pickled
numpy pytrees (framework-native); reference .pth checkpoints are importable
through models.torch_port.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    def conv(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            # typed PRNG keys serialize as raw key data; ensure_key()
            # rewraps on resume (impl recoverable from the data shape:
            # threefry2x32 -> (2,), rbg -> (4,))
            return np.asarray(jax.random.key_data(x))
        return np.asarray(x)

    return jax.tree.map(conv, tree)


def ensure_key(x):
    """Rewrap a checkpointed PRNG key: raw uint32 key data (or a legacy
    raw key from an old checkpoint) -> typed key.  Typed keys pass
    through unchanged."""
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        return x
    import jax.numpy as jnp

    data = jnp.asarray(x)
    impl = {2: "threefry2x32", 4: "rbg"}[data.shape[-1]]
    return jax.random.wrap_key_data(data, impl=impl)


def save_checkpoint(path: str, payload: dict, backend: str = "pickle") -> None:
    """backend: "pickle" (default, reference-style single file) or
    "orbax" (async-capable OCDBT directory checkpoint, for large states)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path) + ".orbax", _to_numpy(payload), force=True)
        ckptr.wait_until_finished()
        return
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(payload), f, pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str) -> dict:
    """Load a framework checkpoint (.pkl / .orbax dir) or a reference
    torch .pth."""
    if path.endswith(".pth"):
        from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import (
            torch_port,
        )

        sd, loaded = torch_port.load_torch_checkpoint(path)
        variables = torch_port.generator_from_torch_state(sd)
        return {"epoch": loaded.get("epoch", 0), "generator": variables}
    if path.endswith(".orbax") or os.path.isdir(path + ".orbax"):
        import orbax.checkpoint as ocp

        target = path if path.endswith(".orbax") else path + ".orbax"
        return ocp.StandardCheckpointer().restore(os.path.abspath(target))
    with open(path, "rb") as f:
        return pickle.load(f)

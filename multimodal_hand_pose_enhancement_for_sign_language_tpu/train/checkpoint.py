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


class _KeyData:
    """Pickled stand-in for a typed PRNG key: raw key data + the impl
    name, so the round-trip is unambiguous (rbg vs unsafe_rbg share a
    (4,) data shape).  Opaque to jax.tree.map (not a registered pytree);
    only ensure_key() unwraps it."""

    __slots__ = ("data", "impl")

    def __init__(self, data, impl):
        self.data = data
        self.impl = impl


def _to_numpy(tree, keys_as: str = "tagged"):
    def conv(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            data = np.asarray(jax.random.key_data(x))
            if keys_as == "tagged":
                return _KeyData(data, str(jax.random.key_impl(x)))
            # orbax can only store arrays: raw key data; ensure_key()
            # falls back to the shape heuristic on resume
            return data
        return np.asarray(x)

    return jax.tree.map(conv, tree)


def ensure_key(x):
    """Rewrap a checkpointed PRNG key -> typed key.  Accepts a tagged
    _KeyData (pickle checkpoints, exact impl), raw uint32 key data
    (orbax / legacy checkpoints, impl inferred from the trailing shape:
    threefry2x32 -> (2,), rbg -> (4,)), or an already-typed key (passes
    through unchanged)."""
    import jax.numpy as jnp

    if isinstance(x, _KeyData):
        return jax.random.wrap_key_data(jnp.asarray(x.data), impl=x.impl)
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        return x

    data = jnp.asarray(x)
    shape = data.shape[-1] if data.ndim else None
    impl = {2: "threefry2x32", 4: "rbg"}.get(shape)
    if impl is None:
        raise ValueError(
            "ensure_key: unrecognized PRNG key data with shape "
            f"{data.shape} (dtype {data.dtype}); expected a typed key, "
            "tagged key data, or raw uint32 data with trailing dim 2 "
            "(threefry2x32) or 4 (rbg)."
        )
    return jax.random.wrap_key_data(data, impl=impl)


def save_checkpoint(path: str, payload: dict, backend: str = "pickle") -> None:
    """backend: "pickle" (default, reference-style single file) or
    "orbax" (async-capable OCDBT directory checkpoint, for large states)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(path) + ".orbax",
            _to_numpy(payload, keys_as="raw"),
            force=True,
        )
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

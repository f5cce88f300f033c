"""Device-resident dataset staging records shared by the trainers.

Round-4 OOM post-mortem (config-2 article-scale training): staging a
resident (31128, 192, 264) f32 dataset on a TPU tiles the 264-wide lane
axis up to 384 (1.5x: 8.55 GB vs 5.88 GB unpadded) AND leaves the
program with an in-HLO relayout copy NEXT TO the argument buffers —
16.4 GB on a 15.75 GB chip.  Staging the same data flattened to
(N, T*D) makes the lane axis an exact tile multiple (192 = 64*3, so
T*D is a multiple of 128 for any even D): zero padding, no relayout,
and only the gathered (B,)-sized batch pays a per-step reshape back to
(B,) + trail inside the compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Staged(tuple):
    """(dev, trail): the (N, prod(trail))-flattened device array plus the
    original per-sample shape.  Unpacked before any jit boundary (only
    .dev crosses it); never handed to jax directly."""

    __slots__ = ()

    def __new__(cls, dev, trail):
        return tuple.__new__(cls, (dev, tuple(trail)))

    @property
    def dev(self):
        return self[0]

    @property
    def trail(self):
        return self[1]


def flatten_rows(a):
    """Host- or device-side (N, ...) -> (N, -1) plus the trailing shape."""
    a = np.asarray(a) if not isinstance(a, jax.Array) else a
    trail = tuple(a.shape[1:])
    return a.reshape(a.shape[0], -1), trail


def as_staged(a):
    """Normalize a resident-epoch operand: pass Staged through, wrap a
    raw (N, ...) array (legacy callers / tests)."""
    if a is None or isinstance(a, Staged):
        return a
    a = jnp.asarray(a)
    return Staged(a.reshape(a.shape[0], -1), a.shape[1:])


def unflatten_batch(x, trail):
    """Reshape a gathered (B, prod(trail)) batch back to (B,) + trail."""
    if trail is None or x.shape[1:] == tuple(trail):
        return x
    return x.reshape((x.shape[0],) + tuple(trail))

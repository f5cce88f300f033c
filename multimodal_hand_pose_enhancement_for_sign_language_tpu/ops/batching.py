"""Shape-bucketed batching for ragged lists of clips.

XLA compiles one program per input shape; a ragged dataset (thousands of
distinct clip lengths) would trigger thousands of compiles.  All
frame-independent clip ops therefore run through `apply_clipwise`, which

  * pads each clip's time axis up to the next multiple of `t_bucket`
    (edge-replicating the last frame, so no Inf/NaN garbage is computed),
  * groups clips by padded length and pads the batch axis up to the next
    power of two (repeating the first clip),
  * runs one vmapped, jitted call per (batch_bucket, t_bucket) pair,
  * slices the results back to the original lengths.

This is valid only for ops where each output frame depends solely on the
same input frame (true for all rotation conversions, FK and IK).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _bucket_len(t: int, t_bucket: int) -> int:
    return ((t + t_bucket - 1) // t_bucket) * t_bucket


def apply_clipwise(
    fn, clips, *args, t_bucket: int = 64, dtype=np.float32,
    max_batch: int = 1024,
):
    """Apply `fn(clip, *args) -> array` to every (T_i, D) clip in `clips`.

    `fn` must be vmappable over the clip axis and frame-independent.
    Extra `args` are broadcast (passed unbatched) to every clip.
    Returns a list of np.ndarrays with original T_i leading dims.

    `max_batch` bounds one device call's clip count: an article-scale
    group (31K clips in one T-bucket) would otherwise materialize a
    multi-GB padded stack (plus 3x3-matrix intermediates) in a single
    call.  Full groups of max_batch share one compiled program.
    """
    if len(clips) == 0:
        return []
    batched = _get_batched(fn, len(args))

    groups: dict = {}
    for i, c in enumerate(clips):
        c = np.asarray(c, dtype=dtype)
        tb = _bucket_len(max(c.shape[0], 1), t_bucket)
        groups.setdefault((tb, c.shape[1:]), []).append((i, c))

    out = [None] * len(clips)
    for (tb, feat_shape), members in groups.items():
        for start in range(0, len(members), max_batch):
            chunk = members[start : start + max_batch]
            n = len(chunk)
            nb = _next_pow2(n)
            stack = np.empty((nb, tb) + feat_shape, dtype=dtype)
            for slot, (i, c) in enumerate(chunk):
                stack[slot, : c.shape[0]] = c
                if c.shape[0] < tb:  # edge-pad with the last frame
                    stack[slot, c.shape[0] :] = c[-1]
            for slot in range(n, nb):  # batch padding: repeat first clip
                stack[slot] = stack[0]
            res = np.asarray(batched(jnp.asarray(stack), *args))
            for slot, (i, c) in enumerate(chunk):
                out[i] = res[slot, : c.shape[0]]
    return out


_BATCHED_CACHE: dict = {}


def _get_batched(fn, n_extra: int):
    key = (fn, n_extra)
    if key not in _BATCHED_CACHE:
        in_axes = (0,) + (None,) * n_extra
        _BATCHED_CACHE[key] = jax.jit(jax.vmap(fn, in_axes=in_axes))
    return _BATCHED_CACHE[key]

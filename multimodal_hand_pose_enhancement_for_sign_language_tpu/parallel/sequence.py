"""Sequence parallelism for the lifting filter: time sharded over devices.

The reference forces every clip to 192 frames (video-level data to 1920)
and has no way to scale sequence length.  The filter's smoothness term
couples only ADJACENT frames, so a clip's time axis shards cleanly over
the mesh with a one-frame halo exchange per SGD iteration:

  * each device owns a contiguous (T/n, nPoints) time slab,
  * per iteration, neighbors exchange their boundary frames with
    `lax.ppermute` over ICI (two 50-float vectors per step — latency-bound
    but tiny),
  * the data term is embarrassingly parallel; global loss denominators
    are static.

The whole n-cycle loop runs inside one `shard_map`, so the 900 iterations
compile to a single program with 900 tiny collectives riding ICI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 top-level API; experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _halo_grads(s, left_nb, right_nb, axis_name, denom):
    """Smoothness gradient for a local slab, using neighbor boundary rows.

    s: (Tl, n); left_nb/right_nb: (1, n) neighbor boundary frames (the
    previous device's last frame / next device's first frame); devices at
    the chain ends receive their own boundary (masked below).
    """
    idx = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)
    first = idx == 0
    last = idx == n_dev - 1

    # pairwise differences with the right neighbor appended
    s_next = jnp.concatenate([s[1:], right_nb], axis=0)  # (Tl, n)
    d = s - s_next  # d_t = s_t - s_{t+1}
    # the last device has no (T-1 -> T) pair: mask its final row
    row_ids = jnp.arange(s.shape[0])[:, None]
    valid = jnp.where(last, row_ids < s.shape[0] - 1, jnp.ones_like(row_ids, bool))
    d = jnp.where(valid, d, 0.0)

    # g_t = 2 d_t - 2 d_{t-1}; d_{t-1} for the first row lives upstream
    d_prev_first = left_nb - s[0:1]  # left neighbor's d at its last row
    d_prev_first = jnp.where(first, 0.0, d_prev_first)
    d_prev = jnp.concatenate([d_prev_first, d[:-1]], axis=0)
    return (2.0 * d - 2.0 * d_prev) / denom


_COMPILED_CACHE: dict = {}


def filter_xyz_time_sharded(
    x0,
    y0,
    z0,
    tarx,
    tary,
    w,
    mesh: Mesh,
    axis_name: str = "data",
    learning_rate: float = 20.0,
    n_cycles: int = 900,
):
    """Single-clip filtering with the TIME axis sharded over `mesh`.

    All arrays (T, nPoints) with T divisible by the axis size.  Semantics
    identical to lifting.filtering.filter_xyz (full-length clip, no
    padding mask).  Use for clips too long for one device or to spread a
    single huge clip across the mesh.  The compiled program is cached per
    (mesh, shape, lr, n_cycles) so per-clip dataset loops don't recompile.
    """
    key = (mesh, axis_name, x0.shape, float(learning_rate), int(n_cycles))
    if key in _COMPILED_CACHE:
        fn = _COMPILED_CACHE[key]
    else:
        fn = _build_sharded(
            x0.shape, mesh, axis_name, float(learning_rate), int(n_cycles)
        )
        _COMPILED_CACHE[key] = fn
    spec = NamedSharding(mesh, P(axis_name, None))
    args = [jax.device_put(jnp.asarray(a), spec) for a in (x0, y0, z0, tarx, tary, w)]
    return fn(*args)


def _build_sharded(shape, mesh, axis_name, learning_rate, n_cycles):
    T, n_points = shape
    denom_data = jnp.float32(T * n_points)
    denom_smooth = jnp.float32((T - 1) * n_points)
    lr = jnp.float32(learning_rate)

    def local_loop(x, y, z, tx, ty, ww):
        def halo(s):
            # neighbor boundary rows: previous device's last row, next
            # device's first row
            left = jax.lax.ppermute(
                s[-1:], axis_name, [(i, i + 1) for i in range(mesh.shape[axis_name] - 1)]
            )
            right = jax.lax.ppermute(
                s[0:1], axis_name, [(i + 1, i) for i in range(mesh.shape[axis_name] - 1)]
            )
            return left, right

        def body(_, state):
            x, y, z = state

            def smooth(s):
                left, right = halo(s)
                return _halo_grads(s, left, right, axis_name, denom_smooth)

            gx = 2.0 * ww * (x - tx) / denom_data + smooth(x)
            gy = 2.0 * ww * (y - ty) / denom_data + smooth(y)
            gz = smooth(z)
            return (x - lr * gx, y - lr * gy, z - lr * gz)

        return jax.lax.fori_loop(0, n_cycles, body, (x, y, z))

    sharded = shard_map(
        local_loop,
        mesh=mesh,
        in_specs=(P(axis_name, None),) * 6,
        out_specs=(P(axis_name, None),) * 3,
    )
    return jax.jit(sharded)

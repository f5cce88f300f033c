"""Pallas TPU kernels for the hot elementwise loops.

1. ``filter_sgd``   — the lifting engine's 900-iteration SGD xyz smoothing
   (lifting/filtering.py).  The pure-XLA `fori_loop` writes its carry to
   HBM every iteration; this kernel keeps the whole (clips x joints x
   time) tile resident in VMEM for all iterations, with the temporal
   neighbor terms as lane rolls.  Layout: clips fold into the sublane
   axis (dense clip-major (chunk * J, T_PAD) f32 tiles — no per-clip
   J->56 alignment padding — the dense packing bought +9.6%), time rides
   the lanes.  chunk=64 default (measured best of the 32/64/128 sweep:
   1.515M vs 1.442M kernel frames/s,
   TPU_PROBE.json "filter_chunk_sweep_vmem_raised").

2. ``robust_loss``  — the Barron general robust loss with its gradient
   w.r.t. x, fused into one VPU pass over (rows, lanes) tiles (BASELINE's
   "fused Pallas loss kernel").  Exposed as `lossfun_pallas` with a
   custom VJP (dx from the kernel; d(alpha)/d(scale) via the jnp
   reference implementation, used only when latents are trained).

Both kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_hand_pose_enhancement_for_sign_language_tpu.losses.robust import (
    general as robust_general,
)

J = 50  # joints
_MACHINE_EPS = np.float32(np.finfo(np.float32).eps)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# 1. fused filtering SGD
# ---------------------------------------------------------------------------


def _filter_kernel(n_cycles, x_ref, y_ref, z_ref, bx_ref, by_ref, a_ref, pm_ref, xo_ref, yo_ref, zo_ref):
    # Every constant is folded into the precomputed tiles host-side: with
    # a = 1 - lr*w2, b = lr*w2*tar and pm' = 2*lr*pair/ds, one SGD step
    # per coordinate is
    #   s <- a*s + b - sd + roll(sd, 1),   sd = (s - roll(s, -1)) * pm'
    # (a == 1, b == 0 for z, which has no data term): 22 VPU ops/cycle
    # instead of the 30 of the literal gradient form.  Measured NEUTRAL
    # on the chip (the 27% op cut moved <1% — the loop is bound by the
    # per-iteration VMEM round-trips of the carry, not op issue), kept
    # for the simpler dependency chain; the row-packing above is what
    # actually pays.
    bx = bx_ref[:]  # lr * w2 * tarx, per row
    by = by_ref[:]
    a = a_ref[:]  # 1 - lr * w2
    pm = pm_ref[:]  # 2 * lr * pair_mask / ((t_real - 1) * nPoints)

    def body(_, state):
        x, y, z = state
        L = x.shape[1]

        def sd(s):
            # pltpu.roll wants non-negative shifts: roll(-1) == roll(L-1)
            return (s - pltpu.roll(s, L - 1, axis=1)) * pm

        dx = sd(x)
        dy = sd(y)
        dz = sd(z)
        return (
            a * x + bx - dx + pltpu.roll(dx, 1, axis=1),
            a * y + by - dy + pltpu.roll(dy, 1, axis=1),
            z - dz + pltpu.roll(dz, 1, axis=1),
        )

    x, y, z = jax.lax.fori_loop(
        0, n_cycles, body, (x_ref[:], y_ref[:], z_ref[:])
    )
    xo_ref[:] = x
    yo_ref[:] = y
    zo_ref[:] = z


def filter_sgd(
    x0, y0, z0, tarx, tary, w, mask, learning_rate: float, n_cycles: int,
    chunk: int = 64, interpret: bool | None = None,
):
    """Batched fused filtering.

    All tensor args are (B, T, J=50); mask is (B, T).  Returns filtered
    (x, y, z) with the same shapes.  Semantics identical to
    lifting/filtering.filter_xyz vmapped over the batch.
    """
    if interpret is None:
        interpret = not _on_tpu()
    B, T, _ = x0.shape
    t_pad = max(128, -(-T // 128) * 128)
    # The chunk scales inversely with t_pad so block_bytes stays in the
    # ~1.6 MB regime the VMEM budget below is calibrated for (long-clip
    # buckets otherwise push Mosaic's scoped-vmem request past what the
    # compiler will grant).  Throughput is flat in chunk (32/64/128
    # sweep), so this costs nothing.  The rescale keeps chunk a positive
    # multiple of 4, which keeps block row counts sublane-aligned
    # (chunk * J % 8 == 0).
    chunk = max(4, (chunk * 128 // t_pad) // 4 * 4)
    return _filter_sgd_scaled(
        x0, y0, z0, tarx, tary, w, mask, learning_rate, n_cycles,
        chunk, interpret,
    )


def _filter_sgd_scaled(
    x0, y0, z0, tarx, tary, w, mask, learning_rate, n_cycles,
    chunk, interpret,
):
    """Inner path: `chunk` is final (already t_pad-rescaled exactly once).

    Split out so batch segmentation below does not re-apply the rescale
    (which would silently shrink the calibrated block size for long-clip
    buckets on every recursion level).
    """
    B, T, _ = x0.shape
    t_pad = max(128, -(-T // 128) * 128)
    # XLA stack-allocates each pallas call's output tuple in scoped VMEM
    # (observed: programs whose 3-output tuple exceeds ~20 MB fail
    # compile with 'exceeded scoped vmem limit' regardless of the
    # kernel's own budget), so large batches are split across several
    # pallas calls with bounded outputs inside the same jit.  The budget
    # is applied to the PADDED per-call batch: seg is a multiple of
    # chunk, so b_pad == seg inside each full segment.
    seg = (20 * 1024 * 1024) // (J * t_pad * 12)
    seg = max(chunk, (seg // chunk) * chunk)
    if B > seg:
        parts = [
            _filter_sgd_scaled(
                x0[i : i + seg], y0[i : i + seg], z0[i : i + seg],
                tarx[i : i + seg], tary[i : i + seg], w[i : i + seg],
                mask[i : i + seg], learning_rate, n_cycles,
                chunk, interpret,
            )
            for i in range(0, B, seg)
        ]
        return tuple(
            jnp.concatenate([p[k] for p in parts]) for k in range(3)
        )
    # Rows pack DENSELY as clip-major (B*J, T): nothing in the kernel
    # indexes by clip (all row-wise elementwise with per-row coefficient
    # tiles; rolls ride the lanes), so no per-clip sublane alignment is
    # needed — padding J 50->56 would waste 12% of all VPU work.
    n_chunks = -(-B // chunk)
    b_pad = n_chunks * chunk

    def to_tiles(a):  # (B, T, J) -> (b_pad * J, t_pad)
        a = jnp.swapaxes(a, 1, 2)  # (B, J, T)
        a = jnp.pad(a, ((0, b_pad - B), (0, 0), (0, t_pad - T)))
        return a.reshape(b_pad * J, t_pad)

    t_real = jnp.sum(mask, axis=1)  # (B,)
    dd = t_real * J  # data denom
    ds = (t_real - 1.0) * J  # smoothness denom
    lr = jnp.asarray(learning_rate, x0.dtype)

    # lr and the gradient's 2x are folded into the tiles (see kernel note)
    lw2 = 2.0 * lr * w * mask[:, :, None] / dd[:, None, None]  # lr * w2
    bx_rows = lw2 * tarx
    by_rows = lw2 * tary
    a_rows = 1.0 - lw2
    # pair mask over time: valid for t < t_real - 1 (mask_t * mask_{t+1})
    pair = mask[:, :-1] * mask[:, 1:]
    pair = jnp.concatenate([pair, jnp.zeros((B, 1), mask.dtype)], axis=1)  # (B, T)
    pm_rows = (2.0 * lr * pair / ds[:, None])[:, :, None] * jnp.ones(
        (1, 1, J), mask.dtype
    )

    tiles = [to_tiles(a) for a in (x0, y0, z0, bx_rows, by_rows, a_rows, pm_rows)]

    rows = chunk * J
    grid = (n_chunks,)
    spec = pl.BlockSpec((rows, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((b_pad * J, t_pad), x0.dtype)] * 3

    # Budget VMEM explicitly so the pipeline can exceed the compiler's
    # default ~16 MB scoped limit.  The multiplier is empirically
    # calibrated (on-chip sweep at t_pad 128 and 256): the enforced cap
    # is the request minus a ~2 MB reserve while Mosaic plans close to
    # the request, so a tight request (x28 blocks) fails by under a
    # block; x36 leaves the reserve-sized slack at every bucket shape.
    # The output tuple also lands in scoped vmem, hence the >20 MB
    # batch segmentation above.
    block_bytes = rows * t_pad * 4
    vmem_limit = min(block_bytes * 36 + (2 << 20), 100 * 1024 * 1024)
    kernel = functools.partial(_filter_kernel, n_cycles)
    xo, yo, zo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * 7,
        out_specs=[spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(*tiles)

    def from_tiles(a):  # back to (B, T, J)
        a = a.reshape(b_pad, J, t_pad)[:B, :, :T]
        return jnp.swapaxes(a, 1, 2)

    return from_tiles(xo), from_tiles(yo), from_tiles(zo)


# ---------------------------------------------------------------------------
# 2. fused robust loss (+ dx)
# ---------------------------------------------------------------------------


def _robust_kernel(x_ref, a_ref, c_ref, loss_ref, dx_ref):
    x = x_ref[:]
    alpha = a_ref[0:1, :]  # one broadcast row per (1, D) parameter vector
    c = c_ref[0:1, :]
    xc = x / c
    u = xc * xc

    beta = jnp.maximum(_MACHINE_EPS, jnp.abs(alpha - 2.0))
    alpha_safe = jnp.where(alpha >= 0, 1.0, -1.0) * jnp.maximum(
        _MACHINE_EPS, jnp.abs(alpha)
    )
    base = u / beta + 1.0
    pow_half_a = jnp.power(base, 0.5 * alpha)
    loss_general = (beta / alpha_safe) * (pow_half_a - 1.0)
    # d/dx of the general branch: (x / c^2) * base^(alpha/2 - 1)
    dx_general = (x / (c * c)) * pow_half_a / base

    loss_two = 0.5 * u
    dx_two = x / (c * c)
    loss_zero = jnp.log1p(jnp.minimum(0.5 * u, 33e37))
    dx_zero = (x / (c * c)) / (0.5 * u + 1.0)

    is_two = alpha == 2.0
    is_zero = alpha == 0.0
    loss_ref[:] = jnp.where(
        is_zero, loss_zero, jnp.where(is_two, loss_two, loss_general)
    )
    dx_ref[:] = jnp.where(is_zero, dx_zero, jnp.where(is_two, dx_two, dx_general))


def _robust_fwd_pallas(x, alpha, scale, interpret, block_rows: int = 8):
    """x (N, D); alpha/scale broadcastable (1, D) or scalars.

    Tiled over row blocks so arbitrarily large batches never exceed VMEM;
    alpha/scale ride along as a single broadcast row per block.
    """
    N, D = x.shape
    d_pad = -(-D // 128) * 128
    n_pad = -(-N // block_rows) * block_rows
    xp = jnp.pad(x, ((0, n_pad - N), (0, d_pad - D)))
    a = jnp.broadcast_to(jnp.asarray(alpha, x.dtype), (1, D))
    c = jnp.broadcast_to(jnp.asarray(scale, x.dtype), (1, D))
    # pad alpha with 2.0 / scale with 1.0 so padding lanes stay finite
    ap = jnp.pad(a, ((0, 0), (0, d_pad - D)), constant_values=2.0)
    cp = jnp.pad(c, ((0, 0), (0, d_pad - D)), constant_values=1.0)
    ap = jnp.broadcast_to(ap, (8, d_pad))  # min f32 sublane tile
    cp = jnp.broadcast_to(cp, (8, d_pad))

    grid = (n_pad // block_rows,)
    row_spec = pl.BlockSpec(
        (block_rows, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    bcast_spec = pl.BlockSpec((8, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    loss, dx = pl.pallas_call(
        _robust_kernel,
        grid=grid,
        in_specs=[row_spec, bcast_spec, bcast_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((n_pad, d_pad), x.dtype)] * 2,
        interpret=interpret,
    )(xp, ap, cp)
    return loss[:N, :D], dx[:N, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lossfun_pallas(x, alpha, scale, interpret=None):
    """Fused Barron loss; matches losses.robust.general.lossfun for
    alpha in {0, 2} U (general branch) — the adaptive training range."""
    if interpret is None:
        interpret = not _on_tpu()
    loss, _ = _robust_fwd_pallas(x, alpha, scale, interpret)
    return loss


def _lossfun_fwd(x, alpha, scale, interpret):
    if interpret is None:
        interpret = not _on_tpu()
    loss, dx = _robust_fwd_pallas(x, alpha, scale, interpret)
    return loss, (dx, x, alpha, scale)


def _lossfun_bwd(interpret, res, g):
    dx, x, alpha, scale = res
    # d(alpha), d(scale) through the jnp reference (cheap relative to x,
    # and only needed when latents are actually optimized)
    _, vjp = jax.vjp(
        lambda a, c: robust_general.lossfun(x, a, c), alpha, scale
    )
    da, dc = vjp(g)
    return (g * dx, da, dc)


lossfun_pallas.defvjp(_lossfun_fwd, _lossfun_bwd)

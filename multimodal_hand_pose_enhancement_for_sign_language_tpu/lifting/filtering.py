"""Backpropagation-based 3D filtering: the reference's TF-SGD loop as one
jitted `lax.fori_loop` with a closed-form gradient.

Faithful to 3DposeEstimator/pose3D.py:10-109 including its key quirk: the
forward-kinematics result is SNAPSHOTTED into fresh variables and the 900
SGD steps (lr=20, from utils/utils.py:91-92) optimize the xyz coordinates
DIRECTLY — bone lengths and angles are frozen, so "filtering" is direct
xyz smoothing of:

    loss = sum(w * ((x - tarx)^2 + (y - tary)^2)) / (T * nPoints)
         + sum(adjacent-frame squared diffs of x, y, z) / ((T-1) * nPoints)
         + sum(exp(lines))                      # constant w.r.t. x, y, z

The gradient is hand-derived (two fused elementwise passes instead of
autodiff residuals), the whole 900-iteration loop is one XLA program, and
clips are vmapped/sharded over devices — this replaces the reference's
Pool(24)-of-TF-processes and is the framework's headline throughput win.

`mask`/`t_real` support shape-bucketed batching: padded frames carry w=0
and are excluded from the smoothness term and denominators.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import skeleton


def fk_from_angles(lines, rootsx, rootsy, rootsz, anglesx, anglesy, anglesz):
    """Forward kinematics over the tree (pose3D.py:60-91): x[b] = x[a] +
    L * A/||A||.  Returns (T, nPoints) x/y/z."""
    T = rootsx.shape[0]
    n = skeleton.N_JOINTS
    eps = 1e-10
    L_per_bone = jnp.exp(lines[jnp.asarray(skeleton.BONE_LENGTH_CLASS)])

    # Joint-major (n, T) coordinate planes: full-width lanes per scan
    # step (see init3d.initialization's layout note).
    Px0 = jnp.zeros((n, T), rootsx.dtype).at[0].set(rootsx[:, 0])
    Py0 = jnp.zeros((n, T), rootsx.dtype).at[0].set(rootsy[:, 0])
    Pz0 = jnp.zeros((n, T), rootsx.dtype).at[0].set(rootsz[:, 0])

    normA = (
        jnp.sqrt(anglesx * anglesx + anglesy * anglesy + anglesz * anglesz)
        + eps
    )  # (T, 49)
    Ux = jnp.swapaxes(anglesx / normA, 0, 1)  # (49, T)
    Uy = jnp.swapaxes(anglesy / normA, 0, 1)
    Uz = jnp.swapaxes(anglesz / normA, 0, 1)

    def step(carry, inputs):
        Px, Py, Pz = carry
        a, b, L, ux, uy, uz = inputs  # ux: (T,)
        Px = jax.lax.dynamic_update_index_in_dim(
            Px, jax.lax.dynamic_index_in_dim(Px, a, 0, False) + L * ux, b, 0
        )
        Py = jax.lax.dynamic_update_index_in_dim(
            Py, jax.lax.dynamic_index_in_dim(Py, a, 0, False) + L * uy, b, 0
        )
        Pz = jax.lax.dynamic_update_index_in_dim(
            Pz, jax.lax.dynamic_index_in_dim(Pz, a, 0, False) + L * uz, b, 0
        )
        return (Px, Py, Pz), None

    inputs = (
        jnp.asarray(skeleton.BONE_START),
        jnp.asarray(skeleton.BONE_END),
        L_per_bone,
        Ux,
        Uy,
        Uz,
    )
    (Px, Py, Pz), _ = jax.lax.scan(step, (Px0, Py0, Pz0), inputs)
    return (
        jnp.swapaxes(Px, 0, 1),
        jnp.swapaxes(Py, 0, 1),
        jnp.swapaxes(Pz, 0, 1),
    )


def _smooth_grad(s, mask):
    """Gradient of sum_t (s_t - s_{t+1})^2 over valid adjacent pairs."""
    d = (s[:-1] - s[1:]) * mask[:-1, None] * mask[1:, None]  # pair validity
    g = jnp.zeros_like(s)
    g = g.at[:-1].add(2.0 * d)
    g = g.at[1:].add(-2.0 * d)
    return g


def filter_xyz(
    x0,
    y0,
    z0,
    tarx,
    tary,
    w,
    learning_rate: float = 20.0,
    n_cycles: int = 900,
    mask=None,
):
    """The 900-step SGD xyz smoothing (pose3D.py:93-109).

    All arrays (T, nPoints); returns filtered (x, y, z).
    """
    T, n_points = x0.shape
    if mask is None:
        mask = jnp.ones((T,), x0.dtype)
    t_real = jnp.sum(mask)
    denom_data = t_real * n_points
    denom_smooth = (t_real - 1.0) * n_points
    wm = w * mask[:, None]

    def grad_step(_, state):
        x, y, z = state
        gx = 2.0 * wm * (x - tarx) / denom_data + _smooth_grad(x, mask) / denom_smooth
        gy = 2.0 * wm * (y - tary) / denom_data + _smooth_grad(y, mask) / denom_smooth
        gz = _smooth_grad(z, mask) / denom_smooth
        return (
            x - learning_rate * gx,
            y - learning_rate * gy,
            z - learning_rate * gz,
        )

    x, y, z = jax.lax.fori_loop(0, n_cycles, grad_step, (x0, y0, z0))
    return x, y, z


def filter_xyz_matpow(
    x0,
    y0,
    z0,
    tarx,
    tary,
    w,
    mask,
    learning_rate: float = 20.0,
    n_cycles: int = 900,
    precision=None,
):
    """The 900-step SGD as ~12 batched MXU matmuls (batched over clips).

    The SGD iteration of `filter_xyz` is AFFINE with fixed coefficients:

        x <- x - lr*(W(x - tarx) + S x)  =  A x + b,
        A = I - lr*(W + S),   b = lr * W tarx,

    where W = diag(2*w*mask/(t_real*J)) is per (clip, joint) and S is the
    symmetric tridiagonal smoothness operator (per clip).  So the exact
    n_cycles-step result is the closed form

        x_n = A^n x0 + (I + A + ... + A^{n-1}) b,

    computable by affine square-and-multiply in ceil(log2(n)) squarings +
    popcount-1 composes — 12 batched (T, T) matmuls for n=900 — on the
    MXU instead of 900 sequential VPU cycles.  W is shared between the x
    and y coordinates (one power chain, two offset vectors), and z has no
    data term (A_z = I - lr*S is shared by all joints of a clip — its
    chain is J times cheaper).  Exact to matmul precision: `precision`
    threads to the dot_generals.

    MEASURED AND REJECTED as the TPU production path (TPU_PROBE.json
    "filter_matpow", B=256 T=128): each squaring streams the full
    (B, J, T, T) operand through HBM (~840 MB) while the Pallas kernel
    runs the whole loop VMEM-resident with ~zero HBM traffic, so matpow
    is 2-3x SLOWER (46-70 ms vs 23.6 ms) — and the power chain amplifies
    matmul rounding, so only 'float32' (6-pass) meets the error budget
    (bf16 err 4.3, tf32 err 1.8e-2, f32 5e-5).  Kept as a correct,
    tested alternative backend (engine filter_impl='matpow', default
    precision float32) and as the record of why the iterative VMEM
    kernel is the right TPU design.

    Same contract as `filter_sgd`/vmapped `filter_xyz`: all tensor args
    (B, T, J), mask (B, T); returns filtered (x, y, z).

    Memory note: materializes (B, J, T, T) f32 — with T <= 192 buckets
    and the engine's batch sizes this is O(1) GB; prefer the Pallas
    kernel for very long clips (the sequence-parallel path covers 1920).
    """
    if n_cycles <= 0:  # no-filter baseline: match the fori_loop backends
        return x0, y0, z0
    B, T, Jn = x0.shape
    dtype = x0.dtype
    t_real = jnp.sum(mask, axis=1)  # (B,)
    dd = t_real * Jn
    ds = (t_real - 1.0) * Jn

    # Tridiagonal S per clip, scaled by lr/ds: (S x)_t = 2 d_t - 2 d_{t-1},
    # d_t = (x_t - x_{t+1}) * pm_t  (pm_t = mask_t * mask_{t+1}, t < T-1).
    pm = mask[:, :-1] * mask[:, 1:]  # (B, T-1)
    pm_r = jnp.pad(pm, ((0, 0), (0, 1)))  # pm_t, t in [0, T)
    pm_l = jnp.pad(pm, ((0, 0), (1, 0)))  # pm_{t-1}
    s_scale = (learning_rate / ds)[:, None]
    diag_s = 2.0 * (pm_r + pm_l) * s_scale  # (B, T)
    off_s = -2.0 * pm * s_scale  # (B, T-1) super- and sub-diagonal
    eye = jnp.eye(T, dtype=dtype)
    sub = jnp.eye(T, k=-1, dtype=dtype)  # ones at (t, t-1)
    sup = jnp.eye(T, k=1, dtype=dtype)  # ones at (t, t+1)
    off_r = jnp.pad(off_s, ((0, 0), (0, 1)))  # row t -> off_s[t]
    off_l = jnp.pad(off_s, ((0, 0), (1, 0)))  # row t -> off_s[t-1]
    # A_z = I - lr*S (B, T, T); shared across joints.
    A_z = (
        eye
        - diag_s[:, :, None] * eye
        - off_r[:, :, None] * sup  # (t, t+1) = off_s[t]
        - off_l[:, :, None] * sub  # (t, t-1) = off_s[t-1]
    )

    # Per-(clip, joint) data diagonal, shared by x and y.
    wdiag = (2.0 * learning_rate / dd)[:, None, None] * (
        w * mask[:, :, None]
    )  # (B, T, J)
    wdiag = jnp.swapaxes(wdiag, 1, 2)  # (B, J, T)
    A_xy = A_z[:, None, :, :] - wdiag[..., None] * eye  # (B, J, T, T)
    b_x = wdiag * jnp.swapaxes(tarx, 1, 2)  # (B, J, T)
    b_y = wdiag * jnp.swapaxes(tary, 1, 2)

    def matmul(a, b):
        return jnp.einsum("...ij,...jk->...ik", a, b, precision=precision)

    def matvec(a, v):
        return jnp.einsum("...ij,...j->...i", a, v, precision=precision)

    def affine_pow(A, bs, n):
        """(P, qs) with P = A^n, qs[i] = (I + A + ... + A^{n-1}) bs[i]."""
        Pr, qr = None, [None] * len(bs)  # identity affine
        Pb, qb = A, list(bs)
        while True:
            if n & 1:
                if Pr is None:
                    Pr, qr = Pb, list(qb)
                else:
                    qr = [matvec(Pb, q) + p for q, p in zip(qr, qb)]
                    Pr = matmul(Pb, Pr)
            n >>= 1
            if not n:
                break
            qb = [matvec(Pb, q) + q for q in qb]
            Pb = matmul(Pb, Pb)
        return Pr, qr

    P_xy, (q_x, q_y) = affine_pow(A_xy, [b_x, b_y], n_cycles)
    P_z, _ = affine_pow(A_z, [], n_cycles)

    def apply_xy(P, q, s0):
        s = matvec(P, jnp.swapaxes(s0, 1, 2)) + q  # (B, J, T)
        return jnp.swapaxes(s, 1, 2)

    x = apply_xy(P_xy, q_x, x0)
    y = apply_xy(P_xy, q_y, y0)
    z = jnp.swapaxes(matvec(P_z[:, None], jnp.swapaxes(z0, 1, 2)), 1, 2)
    return x, y, z


def loss_value(x, y, z, tarx, tary, w, lines, mask=None):
    """The filtering loss (for logging/tests), incl. the constant
    sum(exp(lines)) term (pose3D.py:94-99)."""
    T, n_points = x.shape
    if mask is None:
        mask = jnp.ones((T,), x.dtype)
    t_real = jnp.sum(mask)
    wm = w * mask[:, None]
    data = jnp.sum(wm * ((x - tarx) ** 2 + (y - tary) ** 2)) / (t_real * n_points)
    pm = (mask[:-1] * mask[1:])[:, None]
    smooth = jnp.sum(
        pm * ((x[:-1] - x[1:]) ** 2 + (y[:-1] - y[1:]) ** 2 + (z[:-1] - z[1:]) ** 2)
    ) / ((t_real - 1.0) * n_points)
    return data + smooth + jnp.sum(jnp.exp(lines))


def backpropagation_based_filtering_v2(
    lines0,
    rootsx0,
    rootsy0,
    rootsz0,
    anglesx0,
    anglesy0,
    anglesz0,
    tarx,
    tary,
    w,
    structure=None,
    dtype="float32",
    learningRate: float = 20.0,
    nCycles: int = 900,
    regulatorRates=None,
    mask=None,
):
    """Drop-in for pose3D.backpropagationBasedFiltering_v2 (same argument
    order); FK snapshot then direct-xyz SGD."""
    x0, y0, z0 = fk_from_angles(
        jnp.asarray(lines0),
        jnp.asarray(rootsx0),
        jnp.asarray(rootsy0),
        jnp.asarray(rootsz0),
        jnp.asarray(anglesx0),
        jnp.asarray(anglesy0),
        jnp.asarray(anglesz0),
    )
    return filter_xyz(
        x0,
        y0,
        z0,
        jnp.asarray(tarx),
        jnp.asarray(tary),
        jnp.asarray(w),
        learning_rate=learningRate,
        n_cycles=nCycles,
        mask=mask,
    )

"""Lifting engine driver: batched, shape-bucketed, device-sharded.

Replaces the reference's per-clip pipeline (utils/utils.py:44-137):

    Pool(24) over clips x [normalize -> prune -> initialization ->
    900-step TF SGD]

with: clips padded into (batch, T-bucket) groups, the ENTIRE pipeline one
jitted XLA program vmapped over the batch, sharded along a 'data' mesh
axis when multiple devices are visible.  Per-clip noise reproduces the
reference's per-clip RandomState(1234) draws (utils/utils.py:46,66-74).

`lift_2d_to_3d` keeps the reference's partitioned checkpoint-append file
contract (utils/utils.py:120-137) so long runs resume from the last saved
partition.
"""

from __future__ import annotations

import os
import pickle
import threading
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
    load_binary,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import (
    filtering,
    init3d,
    pose2d,
)

_PRUNE_WATCH = (0, 1, 2, 3, 4, 5, 6, 7)
_PRUNE_THRESHOLD = 0.3
_NOISE_SIGMA = 0.001
_LR = 20.0
_N_CYCLES = 900
# Longest T-bucket the matpow backend accepts before its (B, J, T, T)
# power-chain operands become a memory hazard (256: ~0.8 GB at B=64).
MATPOW_MAX_T = 256


def _init_core(kp, mask, noise):
    """Pre-filter pipeline for one padded clip: normalization -> prune ->
    initialization -> FK snapshot (utils/utils.py:44-92, sans filtering).

    Returns (x0, y0, z0, Xx, Xy, Xw) each (T, 50)."""
    Xx = kp[:, 0::3]
    Xy = kp[:, 1::3]
    Xw = kp[:, 2::3]

    Xx, Xy, _, _, _ = pose2d.normalization(Xx, Xy, mask=mask)
    Xx, Xy, Xw = pose2d.prune(Xx, Xy, Xw, _PRUNE_WATCH, _PRUNE_THRESHOLD)
    Xx = Xx * mask[:, None]
    Xy = Xy * mask[:, None]
    Xw = Xw * mask[:, None]

    (
        lines0,
        rootsx0,
        rootsy0,
        rootsz0,
        anglesx0,
        anglesy0,
        anglesz0,
        _,
        _,
        _,
    ) = init3d.initialization(Xx, Xy, Xw, _NOISE_SIGMA, noise=noise, mask=mask)

    x0, y0, z0 = filtering.fk_from_angles(
        lines0, rootsx0, rootsy0, rootsz0, anglesx0, anglesy0, anglesz0
    )
    return x0, y0, z0, Xx, Xy, Xw


def _interleave(Yx, Yy, Yz, dtype):
    B, T, n = Yx.shape
    out = jnp.zeros((B, T, n * 3), dtype)
    out = out.at[..., 0::3].set(Yx)
    out = out.at[..., 1::3].set(Yy)
    out = out.at[..., 2::3].set(Yz)
    return out


def _lift_batch(kps, masks, noises, n_cycles: int, filter_impl: str,
                matpow_precision: str = "float32"):
    x0, y0, z0, Xx, Xy, Xw = jax.vmap(_init_core)(kps, masks, noises)
    if filter_impl == "pallas":
        from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
            pallas_kernels,
        )

        Yx, Yy, Yz = pallas_kernels.filter_sgd(
            x0, y0, z0, Xx, Xy, Xw, masks, _LR, n_cycles
        )
    elif filter_impl == "matpow":
        # 900 sequential VPU cycles as ~12 batched MXU matmuls (the
        # affine closed form; measured slower than the Pallas kernel —
        # see filter_xyz_matpow's docstring)
        T = x0.shape[1]
        if T > MATPOW_MAX_T:
            # (B, J, T, T) f32 materializes B*50*T^2*4 bytes per power-
            # chain operand: the engine's long-clip buckets (T up to
            # 1920) would request tens of GB and OOM the chip.
            raise ValueError(
                f"filter_impl='matpow' materializes a (B, 50, {T}, {T}) "
                f"operator; T={T} exceeds the supported bound "
                f"{MATPOW_MAX_T}.  Use filter_impl='pallas' (TPU) or "
                "'xla' for long-clip buckets."
            )
        Yx, Yy, Yz = filtering.filter_xyz_matpow(
            x0, y0, z0, Xx, Xy, Xw, masks,
            learning_rate=_LR, n_cycles=n_cycles,
            precision=matpow_precision,
        )
    elif filter_impl == "xla":  # the vmapped fori_loop
        Yx, Yy, Yz = jax.vmap(
            lambda a, b, c, tx, ty, w, m: filtering.filter_xyz(
                a, b, c, tx, ty, w, learning_rate=_LR, n_cycles=n_cycles, mask=m
            )
        )(x0, y0, z0, Xx, Xy, Xw, masks)
    else:
        raise ValueError(
            f"unknown filter_impl {filter_impl!r}; expected 'pallas', "
            "'xla' or 'matpow'"
        )
    return _interleave(Yx, Yy, Yz, kps.dtype)


_BATCHED_CACHE: dict = {}


def _lift_batch_sharded(kps, masks, noises, n_cycles, filter_impl, mesh,
                        matpow_precision="float32"):
    """Clip-batch data parallelism: shard_map over the mesh 'data' axis —
    the multi-chip replacement for the reference's Pool(24)-over-clips."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel.sequence import (
        shard_map,
    )

    fn = shard_map(
        partial(_lift_batch, n_cycles=n_cycles, filter_impl=filter_impl,
                matpow_precision=matpow_precision),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    spec = NamedSharding(mesh, P("data"))
    args = [jax.device_put(jnp.asarray(a), spec) for a in (kps, masks, noises)]
    return fn(*args)


def use_pallas_default() -> bool:
    """Pallas filter on real TPUs; pure-XLA loop elsewhere (interpret-mode
    Pallas is far too slow for the 900-cycle production loop)."""
    if os.environ.get("MHPE_LIFT_PALLAS") in ("0", "false"):
        return False
    if os.environ.get("MHPE_LIFT_PALLAS") in ("1", "true"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def filter_impl_default() -> str:
    """'pallas' | 'xla' | 'matpow'.  MHPE_LIFT_FILTER overrides; else the
    Pallas kernel on real TPUs, the XLA loop elsewhere."""
    env = os.environ.get("MHPE_LIFT_FILTER")
    if env is not None:
        if env not in ("pallas", "xla", "matpow"):
            raise ValueError(
                f"MHPE_LIFT_FILTER={env!r}: expected 'pallas', 'xla' or "
                "'matpow'"
            )
        return env
    return "pallas" if use_pallas_default() else "xla"


def _get_batched(n_cycles: int, filter_impl: str, mesh=None):
    # The env var is resolved HERE so it participates in the cache key —
    # reading it at trace time would silently reuse a program compiled
    # under a previous value.
    matpow_precision = os.environ.get("MHPE_MATPOW_PRECISION", "float32")
    # Mesh is hashable: equal meshes share one compiled program
    key = (n_cycles, filter_impl, mesh, matpow_precision)
    if key not in _BATCHED_CACHE:
        if mesh is not None and mesh.devices.size > 1:
            _BATCHED_CACHE[key] = jax.jit(
                partial(
                    _lift_batch_sharded,
                    n_cycles=n_cycles,
                    filter_impl=filter_impl,
                    mesh=mesh,
                    matpow_precision=matpow_precision,
                )
            )
        else:
            _BATCHED_CACHE[key] = jax.jit(
                partial(
                    _lift_batch,
                    n_cycles=n_cycles,
                    filter_impl=filter_impl,
                    matpow_precision=matpow_precision,
                )
            )
    return _BATCHED_CACHE[key]


def _clip_noise(T: int, sigma: float = _NOISE_SIGMA) -> np.ndarray:
    """The reference's per-clip noise: RandomState(1234) drawing T uniforms
    for rootsx, then rootsy, then rootsz (utils/utils.py:46, addNoise at
    pose2Dto3D.py:85-87).  Depends only on the clip LENGTH, so draws are
    cached per T (a 31K-clip run otherwise spins up 31K RandomStates)."""
    return _clip_noise_cached(T, sigma).copy()


@lru_cache(maxsize=4096)
def _clip_noise_cached(T: int, sigma: float) -> np.ndarray:
    rng = np.random.RandomState(1234)
    return np.stack(
        [
            rng.uniform(-sigma, sigma, size=T).astype(np.float32)
            for _ in range(3)
        ]
    )


def lift_clip(kp: np.ndarray, n_cycles: int = _N_CYCLES) -> np.ndarray:
    """Lift one (T, 150) 2D-keypoint clip to 3D (drop-in for
    utils/utils.py:_lift_2d_to_3d)."""
    return lift_clips([np.asarray(kp)], n_cycles=n_cycles)[0]


def lift_clips(
    clips,
    n_cycles: int = _N_CYCLES,
    t_bucket: int = 64,
    max_batch: int = 128,
    use_pallas: bool | None = None,
    mesh=None,
    filter_impl: str | None = None,
) -> list:
    """Lift a list of (T_i, 150) clips, shape-bucketed and batched.

    With `mesh`, the clip batch is sharded over the mesh 'data' axis
    (shard_map) — the multi-chip replacement for Pool(24)-over-clips.
    `filter_impl` picks the 900-cycle filter backend ('pallas' VMEM
    kernel, 'xla' fori_loop, 'matpow' MXU closed form); `use_pallas` is
    the legacy boolean form of the same choice."""
    groups: dict = {}
    for i, c in enumerate(clips):
        c = np.asarray(c, np.float32)
        tb = -(-max(c.shape[0], 1) // t_bucket) * t_bucket
        groups.setdefault(tb, []).append((i, c))

    out = [None] * len(clips)
    if filter_impl is None:
        if use_pallas is None:
            filter_impl = filter_impl_default()
        else:
            filter_impl = "pallas" if use_pallas else "xla"
    n_data = 1 if mesh is None else mesh.shape.get("data", 1)
    fn = _get_batched(n_cycles, filter_impl, mesh=mesh)

    # Batches are DISPATCHED ahead and fetched behind (bounded in-flight
    # queue): jax dispatch is async, so while batch k's result streams
    # back host<->device, batches k+1..k+depth are already computing.
    # On the tunnel-attached dev chip transfers dominate (TPU_PROBE
    # "article_lifting": wall >> 3.3 s device compute), so overlapping
    # fetch with compute+staging is the lever; depth is small because
    # each in-flight batch holds its padded inputs + outputs on device.
    # MHPE_LIFT_PREFETCH=0 restores strictly serial dispatch->fetch
    # (the A/B control; see STATUS "article_lifting" notes).
    # Default 3: the interleaved A/B on identical tunnel conditions
    # (tpu_lift_prefetch_ab.py, TPU_PROBE "lift_prefetch_ab") measures
    # depth=3 at 1.52x over serial (medians 50.4s vs 76.9s over two
    # alternating reps at 4000 clips).  The earlier r3 observation of
    # overlap "losing" (1176s vs 671s) compared runs on DIFFERENT days
    # of tunnel load and is superseded by the controlled A/B.
    pending: list = []
    depth = int(os.environ.get("MHPE_LIFT_PREFETCH", "3"))

    def _drain(entry):
        chunk, res_dev = entry
        res = np.asarray(res_dev)
        for slot, (i, c) in enumerate(chunk):
            out[i] = res[slot, : c.shape[0]]

    for tb, members in groups.items():
        for start in range(0, len(members), max_batch):
            chunk = members[start : start + max_batch]
            n = len(chunk)
            nb = 1
            while nb < n:
                nb *= 2
            nb = -(-nb // n_data) * n_data  # divisible across the mesh
            kps = np.zeros((nb, tb, 150), np.float32)
            masks = np.zeros((nb, tb), np.float32)
            noises = np.zeros((nb, 3, tb), np.float32)
            for slot, (i, c) in enumerate(chunk):
                kps[slot, : c.shape[0]] = c
                masks[slot, : c.shape[0]] = 1.0
                noises[slot, :, : c.shape[0]] = _clip_noise(c.shape[0])
            res_dev = fn(jnp.asarray(kps), jnp.asarray(masks), jnp.asarray(noises))
            pending.append((chunk, res_dev))
            if len(pending) > depth:
                _drain(pending.pop(0))
    for entry in pending:
        _drain(entry)
    return out


def _atomic_save(obj, filename: str) -> None:
    """save_binary's naming contract with a temp-file + rename write, so
    a crash mid-pickle never leaves a truncated checkpoint (the resume
    path trusts whatever it finds on disk)."""
    final = filename if filename.endswith(".pkl") else filename + ".pkl"
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, final)


class _CheckpointWriter(threading.Thread):
    """Background `_atomic_save` whose failures surface at join().

    A bare Thread only prints write errors (disk full, ...) through the
    default excepthook: join() returns normally, the lifting loop keeps
    reporting progress, and a later --resume silently restarts from an
    older on-disk prefix.  Here join() re-raises the writer's exception
    so a failed checkpoint write aborts the run loudly."""

    def __init__(self, obj, filename):
        super().__init__(target=_atomic_save, args=(obj, filename))
        self.exc = None

    def run(self):
        try:
            super().run()
        except BaseException as e:  # re-raised at join()
            self.exc = e

    def join(self, timeout=None):
        super().join(timeout)
        if self.exc is not None:
            raise self.exc


def lift_2d_to_3d(
    feats,
    filename: str = "feats_3d",
    nPartitions: int = 40,
    n_cycles: int = _N_CYCLES,
    mesh=None,
):
    """Partitioned, resumable lifting over a clip list — the reference's
    file contract (utils/utils.py:120-137): results are appended to
    `filename` one partition at a time, so a crashed run resumes.
    `mesh` shards each partition's clip batch across chips.

    Host I/O overlaps device compute two ways: partition k's checkpoint
    pickle is written by a background thread while partition k+1 lifts
    (joined before the next write, so the on-disk file is always a
    consistent prefix), and inside each partition `lift_clips` keeps a
    bounded queue of in-flight device batches.
    """
    feats_3d = []
    if os.path.exists(filename):
        print(f" -> Found file with name {filename}. Appending results.", flush=True)
        feats_3d = load_binary(filename)
    idx = len(feats) // nPartitions + 1
    done = len(feats_3d)
    writer = None
    try:
        for i in range(nPartitions):
            chunk = feats[idx * i : idx * (i + 1)]
            if not chunk:
                continue
            if min(idx * (i + 1), len(feats)) <= done:
                continue  # partition already lifted in a previous run
            lifted = lift_clips(chunk, n_cycles=n_cycles, mesh=mesh)
            # rebinding (not mutating) keeps the list handed to the
            # writer thread immutable
            feats_3d = feats_3d + lifted
            if writer is not None:
                writer.join()
            writer = _CheckpointWriter(feats_3d, filename)
            writer.start()
            print(f"LIFTED {int((i + 1) / nPartitions * 100)}%", flush=True)
    finally:
        if writer is not None:
            writer.join()
    return feats_3d

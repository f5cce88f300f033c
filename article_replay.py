#!/usr/bin/env python
"""Article replay: the whole publication pipeline as ONE command.

Chains, end to end, the workload the article + launcher define
(/root/reference/launch_exp_incr_fingers.sh:10-20, article PDF
§4.1.3/§5.2; BASELINE.md):

  1. fixture        — synthetic processed dataset at article scale
                      (31,128 / 1,741 / 2,322 sentence-level windows,
                      article §5) via data.synthetic.make_r6d_dataset;
                      OR --data_dir with real How2Sign pickles, consumed
                      unchanged.
  2. raw smoke      — (optional) a small OpenPose-format tree pushed
                      through process_dataset --lift (JSON ingestion ->
                      900-cycle lifting -> r6d), proving the raw-data
                      entry of the chain end to end.
  3. train          — the two canonical configs, 200-epoch resident-scan
                      training on device: v1/arm2wh/L1 (Table 1) and
                      v2+text/arm_wh2finger1/RobustLoss (Table 2 / the
                      VERDICT's canonical corner; the launcher's lr=1e-3).
  4. inference      — L1 per split (train/val/test, the Table-1/2 shape)
                      + save_results r6d/aa/xyz pickles per config.
  5. classifier     — LSTM topic classifier trained on ground-truth r6d
                      and on the ENHANCED r6d (the article's surrogate
                      quality eval, §5.2), accuracies recorded.

Emits ARTICLE_REPLAY.json with per-stage wall-clocks, the Table-shaped
L1 numbers, classifier accuracies, and the article's published numbers
alongside for comparison.  On synthetic data the ABSOLUTE numbers are
not the article's (real How2Sign + pretrained text towers are
environment-blocked); the point is that the same driver run with
--data_dir <real pickles> produces the real table.

Usage:
  python article_replay.py --scale small --epochs 8          # smoke
  python article_replay.py --scale article                   # the run
  python article_replay.py --data_dir /path/to/how2sign_pkls # real data
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

# article-published numbers (BASELINE.md; article Tables 1/2, §4.1.3, §5.2)
ARTICLE_REFERENCE = {
    "table1_arm2wh_L1": {"train": 2.36, "val": 2.38, "test": 2.39},
    "table1_arm2wh_text_L1": {"train": 2.37, "val": 2.38, "test": 2.38},
    "table2_finger1_L1": {"val": 0.320, "test": 0.324},
    # full Table 2 masked-finger series, K = 1..5 (BASELINE.md:14-15)
    "table2_finger_trend_L1": {
        "val": [0.320, 0.331, 0.338, 0.382, 0.418],
        "test": [0.324, 0.330, 0.341, 0.381, 0.411],
    },
    # Table 2's third row, "val L1 per masked finger" (BASELINE.md:16):
    # exactly the first row divided by K (0.331/2=0.166, 0.338/3=0.113,
    # 0.382/4=0.096, 0.418/5=0.084) — the article's per-finger figure is
    # the total L1 amortized over the K masked fingers
    "table2_finger_per_finger_L1_val": [0.320, 0.166, 0.113, 0.096, 0.084],
    "classifier_val_acc_text_mlp": 0.77,
    "train_wallclock": "2 h / 200 epochs, batch 256, 1 GPU (article 4.1.3)",
    "dataset_scale": {"train": 31128, "val": 1741, "test": 2322},
}

SCALES = {
    "article": {"train": 31128, "val": 1741, "test": 2322},
    "small": {"train": 256, "val": 64, "test": 64},
    "tiny": {"train": 24, "val": 8, "test": 8},
}

# the two canonical configs (VERDICT r2 #1): Table 1's plain body->hands
# row and the finger-masking experiment's v2+text corner
CONFIGS = [
    dict(
        name="arm2wh_v1_L1",
        model="v1", pipeline="arm2wh", loss="L1",
        require_text=False, learning_rate=1e-4,
    ),
    dict(
        name="arm_wh2finger1_v2_text_RobustLoss",
        model="v2", pipeline="arm_wh2finger1", loss="RobustLoss",
        require_text=True, learning_rate=1e-3,  # launcher lr, :14
    ),
]


def stage_fixture(args, work):
    """Synthetic article-scale pickles, or the user's --data_dir as-is.

    Generation runs in a CPU-backend SUBPROCESS: on a tunnel-attached
    dev chip the conversion chain's host<->device transfers would
    dominate (measured: >1 h for the 31K-clip fixture through the
    tunnel vs minutes host-local), and fixture prep is one-time data
    plumbing, not the workload under measurement."""
    if args.data_dir:
        return args.data_dir, {"source": args.data_dir, "wall_s": 0.0}

    import subprocess

    data_dir = os.path.join(work, "video_data")
    counts = SCALES[args.scale]
    small = args.scale in ("small", "tiny")
    code = (
        "from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils."
        "platform import ensure_platform_from_env\n"
        "ensure_platform_from_env()\n"
        "from multimodal_hand_pose_enhancement_for_sign_language_tpu.data "
        "import synthetic\n"
        f"synthetic.make_r6d_dataset({data_dir!r}, split_counts={counts!r}, "
        f"seed=7, save_image_feats={small!r}, ik_roundtrip={small!r}, "
        f"categ_signal={args.signal_fixture!r}, "
        f"finger_signal={args.finger_signal!r})\n"
    )
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-c", code],
        check=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    wall = time.perf_counter() - t0
    fingerprint = _fixture_fingerprint(data_dir)
    with open(os.path.join(data_dir, "fixture_meta.json"), "w") as f:
        json.dump({"categ_signal": args.signal_fixture,
                   "finger_signal": args.finger_signal,
                   "counts": counts, "seed": 7,
                   "fingerprint": fingerprint}, f)
    print(f"[fixture] {counts} in {wall:.1f}s -> {data_dir}", flush=True)
    return data_dir, {"source": "synthetic", "counts": counts, "wall_s": wall,
                      "categ_signal": args.signal_fixture,
                      "finger_signal": args.finger_signal,
                      "fingerprint": fingerprint}


def _fixture_fingerprint(data_dir):
    """Content fingerprint of a fixture dir: sha256 over the sorted
    (name, file-sha256) pairs of every pickle in it.

    The synthetic fixture is deterministic (fixed seed), but the sandbox
    snapshot/restore deletes gitignored work dirs, so a --resume often
    has to REGENERATE it.  A regenerated fixture whose fingerprint
    equals the one recorded in the prior report is bit-identical to the
    data the surviving checkpoints were trained on, so stage resume
    stays valid — without this, every restore forced a full re-train
    (observed Aug 19: restore wiped the signal fixture mid-run with a
    finished 50-epoch checkpoint on disk)."""
    import hashlib

    outer = hashlib.sha256()
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".pkl"):
            continue
        h = hashlib.sha256()
        with open(os.path.join(data_dir, name), "rb") as f:
            for chunk in iter(lambda: f.read(8 << 20), b""):
                h.update(chunk)
        outer.update(name.encode())
        outer.update(h.digest())
    return outer.hexdigest()


def _stats_npz_matches(cfg, data_dir, model_dir, embeds_type="normal"):
    """Validate a surviving checkpoint against a REGENERATED fixture when
    the prior report predates the fixture fingerprint.

    The standardization stats npz written at training time
    (train/data.load_data) is a deterministic function of the full train
    split for the config's pipeline; if stats recomputed from the
    regenerated fixture are bitwise-equal to the on-disk npz, the
    checkpoint was trained on identical X/Y data and the prior-report
    train entry may be trusted.  Only validates the pose streams — for
    require_text configs the text pickle is covered by the fingerprint
    path, not this fallback, so those configs re-train.

    Legacy-only caveat (ADVICE r4): this directly validates the TRAIN
    split; val/test identity rests on the generator's end-to-end seed
    determinism (the prior best_val was measured on the old val split).
    New reports carry the full-content fingerprint, which covers every
    split's pickle bytes directly."""
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
        standardize as std_lib,
    )
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (
        data as tdata,
    )

    if cfg["require_text"]:
        return False
    npz_path = os.path.join(
        model_dir, f"{cfg['name']}{cfg['pipeline']}_preprocess_core.npz"
    )
    if not os.path.exists(npz_path):
        return False
    fetched = tdata._fetch_split_fused(
        data_dir, "train", cfg["pipeline"], False, embeds_type, "./"
    )
    if fetched is None:
        return False
    X, Y, _ = fetched
    mean_X, std_X, mean_Y, std_Y = std_lib.calc_standard(
        np.swapaxes(X, 1, 2), np.swapaxes(Y, 1, 2), cfg["pipeline"]
    )
    with np.load(npz_path) as z:
        return all(
            np.array_equal(z[k], v)
            for k, v in (
                ("body_mean_X", mean_X),
                ("body_std_X", std_X),
                ("body_mean_Y", mean_Y),
                ("body_std_Y", std_Y),
            )
        )


def _finger_trend_comparison(trend):
    """Quantify how the replay's masked-finger L1 series matches article
    Table 2's shape (BASELINE.md:14-15): per-split Pearson correlation
    against the article series, rank (Spearman) correlation, and strict
    monotonicity — the article's signature is a monotone degradation
    with K, and that is the property the fixture is built to reproduce."""
    ks = sorted(int(k) for k in trend if "inference" in trend[k])
    out = {"K": ks}
    art = ARTICLE_REFERENCE["table2_finger_trend_L1"]
    for split in ("val", "test"):
        series = [trend[str(k)]["inference"]["L1"][split] for k in ks]
        ref = [art[split][k - 1] for k in ks if k - 1 < len(art[split])]
        entry = {"replay_L1": series, "article_L1": ref}
        if len(ref) == len(series) and len(series) >= 3:
            a = np.asarray(series, dtype=np.float64)
            b = np.asarray(ref, dtype=np.float64)

            def _corr(x, y):
                # a flat series has zero variance -> corrcoef is NaN,
                # which is not valid strict JSON; report null instead
                if np.std(x) == 0.0 or np.std(y) == 0.0:
                    return None
                return float(np.corrcoef(x, y)[0, 1])

            def _ranks(x):
                # average ranks for ties — argsort-of-argsort would rank
                # a flat series 0..n-1 by index and fake a perfect match
                order = np.argsort(x, kind="stable")
                pos = np.empty(len(x), dtype=np.float64)
                pos[order] = np.arange(len(x), dtype=np.float64)
                _, inv = np.unique(x, return_inverse=True)
                out = np.empty(len(x), dtype=np.float64)
                for g in range(inv.max() + 1):
                    m = inv == g
                    out[m] = pos[m].mean()
                return out

            entry["pearson_r"] = _corr(a, b)
            entry["spearman_r"] = _corr(_ranks(a), _ranks(b))
            entry["strictly_monotone"] = bool(np.all(np.diff(a) > 0))
        if split == "val":
            # Table 2 row 3 ("val L1 per masked finger") is row 1
            # amortized over the K masked fingers — derive the replay's
            # counterpart the same way
            entry["replay_L1_per_finger"] = [
                v / k for v, k in zip(series, ks)
            ]
            entry["article_L1_per_finger"] = [
                ARTICLE_REFERENCE["table2_finger_per_finger_L1_val"][k - 1]
                for k in ks
                if k - 1
                < len(ARTICLE_REFERENCE["table2_finger_per_finger_L1_val"])
            ]
        out[split] = entry
    return out


def _parse_fingers(spec):
    """Masked-finger counts from '--fingers': comma list '1,2,5' or range
    '1..5' -> [1, 2, 3, 4, 5] (the launcher's sweep shape,
    launch_exp_incr_fingers.sh:10)."""
    if ".." in spec:
        lo, hi = spec.split("..")
        return list(range(int(lo), int(hi) + 1))
    return [int(k) for k in spec.split(",") if k]


def _last_run_records(metrics_path):
    """Records of the LAST training run in a metrics JSONL.

    MetricsSink appends, so a re-trained stage stacks runs in one file;
    an epoch number lower than its predecessor marks a restart.  Only
    the final run's records may be trusted for resume decisions —
    otherwise an interrupted re-train inherits the epoch count (and the
    best-val) of an earlier completed run.
    """
    runs, cur, prev_epoch = [], [], None
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            e = rec.get("epoch")
            if e is not None and prev_epoch is not None and e < prev_epoch:
                runs.append(cur)
                cur = []
            if e is not None:
                prev_epoch = e
            cur.append(rec)
    runs.append(cur)
    return runs[-1]


def _metrics_best_val(metrics_path):
    """Best (min) validation generator loss recorded by the LAST
    training run in a metrics JSONL — used to recover a completed train
    stage's result when resuming without re-running 200 epochs."""
    best = None
    for rec in _last_run_records(metrics_path):
        if "loss_val_gen" in rec:
            v = float(rec["loss_val_gen"])
            best = v if best is None else min(best, v)
    return best


def _metrics_best_val_epoch(metrics_path):
    """Epoch index at which the LAST run's best (min) val loss occurred.

    Recorded into every train entry so determinism identities are
    self-documenting: the trend's K=1 run (50 epochs) and the canonical
    config-2 run (200 epochs) share pipeline/seed/data, so when the
    200-epoch best-val epoch is < 50 their best_val values are
    float-identical BY CONSTRUCTION — VERDICT r4 weak #2 flagged that
    identity as looking like a copied entry without this field."""
    best, best_epoch, cur_epoch = None, None, None
    for rec in _last_run_records(metrics_path):
        if "epoch" in rec:
            cur_epoch = int(rec["epoch"])
        if "loss_val_gen" in rec:
            # train_gan logs the val loss as its OWN record right after
            # the epoch's train record (see utils/metrics.py usage), so
            # attribute it to the most recent epoch seen.
            v = float(rec["loss_val_gen"])
            if best is None or v < best:
                best, best_epoch = v, cur_epoch
    return best_epoch


def _metrics_epochs_done(metrics_path):
    """Number of training epochs recorded by the LAST run in a metrics
    JSONL.

    --resume must NOT treat a checkpoint + metrics file as a finished
    stage (the checkpoint is written DURING training, so an interrupted
    200-epoch run would silently resume as 'complete'); the stage only
    counts as done when the LAST run's log reached the requested epoch
    count (earlier completed runs stacked in the same append-mode file
    don't count — their checkpoint was overwritten by the re-train).
    """
    last = -1
    for rec in _last_run_records(metrics_path):
        if "epoch" in rec:
            last = max(last, int(rec["epoch"]))
    return last + 1


def _report_stage_count(rep):
    """Number of completed stage results a replay report carries."""
    return (
        sum("train" in e for e in rep.get("configs", {}).values())
        + len(rep.get("classifier", {}))
        + sum("train" in e for e in rep.get("finger_trend", {}).values())
    )


def _load_prior(out_path):
    """Load the prior report for --resume, preferring whichever of
    ``out_path`` / ``out_path + '.prior'`` carries more stage results,
    and refresh the ``.prior`` backup with the winner.

    The report is flushed incrementally and a fresh run's EARLY flushes
    (fixture stage) contain none of the prior stage entries yet — they
    only re-enter the on-disk file as each stage re-merges them.  A run
    killed inside that window leaves a STRIPPED report behind, and a
    naive restart would silently re-train everything (this happened live
    in round 5: a killed restart's fixture flush dropped two trained
    configs + nine classifier stages from the on-disk report).
    """
    candidates = []
    for path in (out_path, out_path + ".prior"):
        if os.path.exists(path):
            try:
                with open(path) as f:
                    candidates.append(json.load(f))
            except (json.JSONDecodeError, OSError):
                pass  # half-written flush; the other copy decides
    if not candidates:
        return {}
    prior = max(candidates, key=_report_stage_count)
    if candidates[0] is not prior:
        print(f"[resume] {out_path} holds fewer stage results than its "
              ".prior backup (a prior run was killed between the fixture "
              "flush and stage re-merge) — resuming from the backup",
              flush=True)
    if prior:
        tmp = out_path + ".prior.tmp"
        with open(tmp, "w") as f:
            json.dump(prior, f, indent=1)
        os.replace(tmp, out_path + ".prior")
    return prior


def _reconstitute_last_checkpoint(model_dir, name):
    """Rebuild a missing ``lastCheckpoint_{name}.pkl`` from the best-val
    ``{name}_checkpoint.pkl``.

    The trainer's lastCheckpoint is DEFINED as a byte copy of the final
    best-val checkpoint made after the epoch loop exits (train_gan.py
    run-end shutil.copyfile; reference train_gan.py:353-370 semantics),
    so for a COMPLETED run the two files have identical content.  The
    persist mirror (r4_persist.sh) keeps only ``*_checkpoint.pkl`` to
    avoid doubling the tar with byte-duplicates; after a sandbox restore
    the copy is rebuilt here.  Callers must gate on evidence the run
    completed (a prior report 'train' entry, which is only written after
    stage_train returns) — for an INTERRUPTED run the best-val file is
    mid-run state and must NOT be promoted.
    """
    last = os.path.join(model_dir, f"lastCheckpoint_{name}.pkl")
    best = os.path.join(model_dir, f"{name}_checkpoint.pkl")
    if not os.path.exists(last) and os.path.exists(best):
        shutil.copyfile(best, last)
        print(f"[resume] reconstituted {os.path.basename(last)} from the "
              "best-val checkpoint (completed run; lastCheckpoint is its "
              "byte copy by construction)", flush=True)


def stage_raw_smoke(work):
    """OpenPose JSON tree -> process_dataset --lift -> r6d pickles: the
    raw-data entry of the pipeline, proved end to end at small scale."""
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
        synthetic,
    )
    import process_dataset

    raw_root = os.path.join(work, "raw_tree")
    out_dir = os.path.join(work, "raw_processed")
    t0 = time.perf_counter()
    fix = synthetic.make_openpose_tree(
        raw_root, n_videos=2, utts_per_video=2, frames=24, seed=3
    )
    ns = process_dataset.build_parser().parse_args(
        [
            "--dataset_path", fix["dataset_path"],
            "--data_dir", out_dir,
            "--text_path_template",
            os.path.join(fix["dataset_path"], "{split}.text.id.en"),
            "--categ_path_template",
            os.path.join(fix["dataset_path"], "videoID_categoryID_{split}.csv"),
            "--lift",
            "--no-group_by_clip",
            "--n_partitions", "2",
            "--n_cycles", "60",
        ]
    )
    process_dataset.main(ns)
    wall = time.perf_counter() - t0
    produced = sorted(os.listdir(out_dir))
    assert any(f.startswith("r6d_train") for f in produced), produced
    print(f"[raw smoke] {len(produced)} artifacts in {wall:.1f}s", flush=True)
    return {"wall_s": wall, "artifacts": produced}


def stage_train(cfg, data_dir, model_dir, args):
    import train_gan

    ns = train_gan.build_parser().parse_args([])
    ns.model = cfg["model"]
    ns.pipeline = cfg["pipeline"]
    ns.loss = cfg["loss"]
    ns.require_text = cfg["require_text"]
    ns.learning_rate = cfg["learning_rate"]
    ns.num_epochs = args.epochs
    ns.batch_size = args.batch_size
    ns.epochs_train_disc = 3  # adversarial every 3rd epoch (article 4.1.3)
    ns.patience = max(args.epochs, 1000)  # launcher --patience 1000
    ns.data_dir = data_dir
    ns.model_path = model_dir
    ns.exp_name = cfg["name"]
    ns.epoch_scan = not args.no_epoch_scan  # resident-scan fast path
    t0 = time.perf_counter()
    best_val = train_gan.main(ns)
    wall = time.perf_counter() - t0
    metrics = os.path.join(model_dir, f"metrics_{cfg['name']}.jsonl")
    best_epoch = (
        _metrics_best_val_epoch(metrics) if os.path.exists(metrics) else None
    )
    print(f"[train {cfg['name']}] best val {best_val:.4f} "
          f"(epoch {best_epoch}) in {wall:.1f}s", flush=True)
    return {"best_val": float(best_val), "best_val_epoch": best_epoch,
            "wall_s": wall,
            "epochs": args.epochs, "batch_size": args.batch_size,
            "learning_rate": cfg["learning_rate"]}


def stage_infer(cfg, data_dir, model_dir, args, prior=None, on_split=None,
                splits=("train", "val", "test")):
    import inference

    res = {"L1": {}, "wall_s": {}}
    if prior:  # --resume: keep already-measured splits
        res["L1"].update(prior.get("L1", {}))
        res["wall_s"].update(prior.get("wall_s", {}))

    # A split only counts as resumable if its save_results artifacts are
    # still on disk: downstream stages (classifier surrogate eval) read
    # the r6d result pickles, so a report entry whose files were lost
    # (e.g. a cleaned work dir from an earlier round) must re-run, not
    # skip — otherwise the classifier stage crashes on a missing pickle.
    res_dir = os.path.join(
        os.path.dirname(model_dir), f"results_{cfg['name']}"
    )

    def _artifacts_ok(split):
        return all(
            os.path.exists(os.path.join(res_dir, f"{k}_{split}.pkl"))
            for k in ("r6d", "aa", "xyz")
        )

    for split in splits:
        if split in res["L1"]:
            if _artifacts_ok(split):
                print(f"[infer {cfg['name']}/{split}] resumed: "
                      f"L1 {res['L1'][split]:.4f}", flush=True)
                continue
            print(f"[infer {cfg['name']}/{split}] report has L1 "
                  f"{res['L1'][split]:.4f} but result pickles are "
                  f"missing from {res_dir} — re-running", flush=True)
            res["L1"].pop(split, None)
            res["wall_s"].pop(split, None)
        ns = inference.build_parser().parse_args([])
        ns.checkpoint = os.path.join(
            model_dir, f"lastCheckpoint_{cfg['name']}.pkl"
        )
        ns.data_dir = data_dir
        ns.base_path = os.path.dirname(model_dir)
        ns.pipeline = cfg["pipeline"]
        ns.model = cfg["model"]
        ns.require_text = cfg["require_text"]
        ns.infer_set = split
        ns.exp_name = cfg["name"]
        ns.batch_size = args.batch_size
        # the reference CAPS inference at --num_samples (default 3000;
        # its launcher passes 1000) — the replay keeps that contract,
        # which also bounds the result-fetch volume on a tunnel-attached
        # dev chip.  Pass --num_samples -1 for every window.
        ns.num_samples = args.num_samples if args.num_samples > 0 else 10**9
        ns.seqs_to_viz = 2 if split == "test" else 0
        t0 = time.perf_counter()
        err = inference.main(ns)
        res["L1"][split] = float(err)
        res["wall_s"][split] = time.perf_counter() - t0
        print(f"[infer {cfg['name']}/{split}] L1 {err:.4f} "
              f"({res['wall_s'][split]:.1f}s)", flush=True)
        if on_split is not None:
            on_split(res)
    return res


def _selection_indices(res_dir, data_dir, split, require_text=False):
    """Original clip indices of the result rows in ``res_dir``.

    Inference persists these as sel_indices_{split}.pkl (the num_samples
    cap + NaN drops make result row j come from clip sel[j], so category
    labels must be subset with sel to stay aligned — ADVICE r3).  For
    results written before that file existed, the selection is
    reconstructed: it is deterministic (the first-N-NaN-surviving-window
    rule of load_windows/run_inference).  ``require_text`` must match the
    config that wrote the results: a text-conditioned inference also
    drops clips whose sentence-embedding row has NaNs, so the
    reconstruction must apply the same feats rule or every label after
    such a clip would be misaligned."""
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
        load_binary,
    )
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
        windows as win_lib,
    )

    p = os.path.join(res_dir, f"sel_indices_{split}.pkl")
    if os.path.exists(p):
        return load_binary(p)
    results = load_binary(os.path.join(res_dir, f"r6d_{split}.pkl"))
    clips = load_binary(os.path.join(data_dir, f"r6d_{split}.pkl"))
    feats = None
    if require_text:
        feats = load_binary(
            os.path.join(data_dir, f"{split}_sentence_embeddings.pkl")
        )
    sel = win_lib.first_valid_window_indices(clips, len(results), feats=feats)
    assert len(sel) == len(results), (len(sel), len(results))
    return sel


def _build_gt_subset(data_dir, out_dir, sel):
    """GT r6d pickles restricted to the SAME clips the enhanced results
    cover, so the GT-vs-enhanced classifier comparison is like-for-like
    (same windows, same labels; ADVICE r3)."""
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
        load_binary,
        save_binary,
    )

    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val"):
        clips = load_binary(os.path.join(data_dir, f"r6d_{split}.pkl"))
        save_binary(
            [clips[i] for i in sel[split]],
            os.path.join(out_dir, f"r6d_{split}.pkl"),
        )


def stage_classifier(tag, r6d_dir, data_dir, model_dir, args, sel=None):
    """LSTM topic classifier on the r6d pickles in `r6d_dir` (a GT subset
    dir or a results_{exp} dir); categs come from the fixture `data_dir`,
    subset by `sel` (split -> original clip indices) when given so labels
    stay aligned with capped/NaN-filtered result windows."""
    import classifier_main
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
        load_binary,
        save_binary,
    )

    for split in ("train", "val"):
        src = os.path.join(data_dir, f"categs_{split}.pkl")
        dst = os.path.join(r6d_dir, f"categs_{split}.pkl")
        if sel is not None:
            categs = list(load_binary(src))
            save_binary([categs[i] for i in sel[split]], dst)
        elif os.path.abspath(src) != os.path.abspath(dst):
            shutil.copyfile(src, dst)
    ns = classifier_main.build_parser().parse_args([])
    ns.data_dir = r6d_dir
    ns.models_dir = os.path.join(model_dir, f"classifier_{tag}")
    ns.num_epochs = args.classifier_epochs
    ns.batch_size = args.classifier_batch
    ns.hidden_size = args.classifier_hidden
    ns.num_layers = args.classifier_layers
    ns.bidir = args.classifier_bidir
    ns.no_remat = False
    ns.epoch_scan = True  # device-resident: no per-step batch uploads
    t0 = time.perf_counter()
    acc = classifier_main.main(ns)
    wall = time.perf_counter() - t0
    print(f"[classifier {tag}] best val acc {acc:.4f} in {wall:.1f}s",
          flush=True)
    return {"best_val_acc": float(acc), "wall_s": wall,
            "epochs": ns.num_epochs, "hidden": ns.hidden_size,
            "layers": ns.num_layers}


def _build_masked_r6d(src_dir, out_dir, zero_cols):
    """Derived classifier dataset: the r6d pickles of ``src_dir`` with the
    columns in ``zero_cols`` (a slice into the 288-dim full-body r6d
    layout) zeroed.  Zero is a constant post-standardization, so the
    zeroed stream carries no label information — the ablation the
    enhanced>GT anomaly controls need (VERDICT r4 weak #1)."""
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
        load_binary,
        save_binary,
    )

    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val"):
        clips = load_binary(os.path.join(src_dir, f"r6d_{split}.pkl"))
        masked = []
        for c in clips:
            c = np.array(c, copy=True)
            c[:, zero_cols] = 0.0
            masked.append(c)
        save_binary(masked, os.path.join(out_dir, f"r6d_{split}.pkl"))


def stage_anomaly_controls(cls, work, data_dir, model_dir, args, sel):
    """Mechanism controls for the enhanced>GT classifier anomaly seen on
    the signal fixture (VERDICT r4 weak #1: enhanced-r6d 0.983 vs GT-r6d
    0.937 best-val acc).

    The enhancement config whose results the classifier consumes
    (CONFIGS[0], arm2wh/v1) is ALREADY text-free, so text injection
    cannot be the mechanism.  The remaining hypothesis: on a
    categ_signal fixture the class signature rides on the ARM channels
    too; GT hands carry the signature plus heavy per-clip noise, while
    enhanced hands are a DETERMINISTIC function of the (signal-bearing)
    arms — a denoised readout of arm-borne class information.  Three
    ablation classifiers (same budget as the main stages) separate the
    streams:

      gt_arms_only        — hands zeroed: how much label info the arms
                            alone carry (upper bound available to the
                            generator).
      gt_hands_only       — arms zeroed: label info in the NOISY GT
                            hands alone.
      enhanced_hands_only — arms zeroed in the enhanced results: label
                            info the generator actually injected into
                            the hand channels.

    enhanced_hands_only > gt_hands_only with gt_arms_only high confirms
    the transfer mechanism; the article's §5.2 'enhancement preserves
    label information' logic is then read against gt_arms_only, not GT
    hands (/root/reference/H2Sclassifier/Train_Test/main.py:23-121)."""
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
        windows as win_lib,
    )

    arm_cols, hand_cols = win_lib.pipeline_column_slices("arm2wh")
    res_dir = os.path.join(work, f"results_{CONFIGS[0]['name']}")
    gt_dir = os.path.join(work, "classifier_gt_subset")
    controls = cls.setdefault("anomaly_controls", {})
    long_args = argparse.Namespace(**vars(args))
    long_args.classifier_epochs = 3 * args.classifier_epochs
    specs = [
        ("gt_arms_only", gt_dir, hand_cols, args),
        ("gt_hands_only", gt_dir, arm_cols, args),
        ("enhanced_hands_only", res_dir, arm_cols, args),
        # same input stream as gt_arms_only at 3x the training budget:
        # quantifies how much of any enhanced_hands>arms gap is CLASSIFIER
        # extractability (accuracy at fixed budget) rather than
        # information — the data-processing inequality bounds mutual
        # information, not a 10-epoch LSTM's accuracy.
        ("gt_arms_only_long", gt_dir, hand_cols, long_args),
    ]
    out = {}
    for tag, src, zero_cols, st_args in specs:
        if tag not in controls:
            ctl_dir = os.path.join(work, f"classifier_ctl_{tag}")
            _build_masked_r6d(src, ctl_dir, zero_cols)
            controls[tag] = stage_classifier(
                f"ctl_{tag}", ctl_dir, data_dir, model_dir, st_args, sel=sel
            )
        out[tag] = controls[tag]["best_val_acc"]
    arms, gh, eh, arms_long = (
        out["gt_arms_only"], out["gt_hands_only"],
        out["enhanced_hands_only"], out["gt_arms_only_long"],
    )
    if eh > gh:
        # Transfer direction is established BY CONSTRUCTION for the
        # text-free CONFIGS[0]: the enhanced hand channels are a
        # deterministic function of the GT arm channels alone, so any
        # label signal they carry is arm-borne.  eh >> gh shows that is
        # where the enhanced stream's accuracy comes from; eh vs arms
        # measures extractability at fixed classifier budget, not
        # information creation (arms_long shows the arms-only score's
        # budget sensitivity).
        controls["explanation"] = (
            f"CONFIRMED arm->hand signal transfer: the enhanced hand "
            f"channels are a deterministic function of the GT arms "
            f"(CONFIGS[0] is text-free), so their label signal is "
            f"arm-borne by construction; enhanced hands alone score "
            f"{eh:.3f} vs noisy GT hands alone {gh:.3f}.  enhanced "
            f"hands > arms alone ({eh:.3f} vs {arms:.3f}, "
            f"{arms_long:.3f} at 3x budget) is an EXTRACTABILITY gap — "
            f"the generator re-represents arm-borne class signal as "
            f"smooth hand trajectories a fixed-budget LSTM reads more "
            f"easily — not information creation (the data-processing "
            f"inequality bounds information, not accuracy).  So "
            f"'enhanced beats GT' reflects fixture construction (class "
            f"signature on the input channels), and the article's §5.2 "
            f"preservation logic should be read against gt_arms_only."
        )
    else:
        controls["explanation"] = (
            f"controls did NOT confirm the arm-transfer hypothesis "
            f"(arms_only {arms:.3f}/{arms_long:.3f} long, gt_hands_only "
            f"{gh:.3f}, enhanced_hands_only {eh:.3f}); mechanism "
            f"unresolved."
        )
    print(f"[anomaly controls] {controls['explanation']}", flush=True)


def stage_mlp_classifier(data_dir, model_dir, args):
    """The article's text baseline (§5.2.2: MiniLM sentence embeddings ->
    MLP, 77% val accuracy on real data)."""
    import classifier_mlp_main

    ns = classifier_mlp_main.build_parser().parse_args([])
    ns.data_dir = data_dir
    ns.models_dir = os.path.join(model_dir, "classifier_mlp")
    ns.num_epochs = args.classifier_epochs
    ns.batch_size = args.classifier_batch
    t0 = time.perf_counter()
    acc = classifier_mlp_main.main(ns)
    wall = time.perf_counter() - t0
    print(f"[classifier mlp-text] best val acc {acc:.4f} in {wall:.1f}s",
          flush=True)
    return {"best_val_acc": float(acc), "wall_s": wall,
            "epochs": ns.num_epochs}


def _flush_report(report, out_path):
    """Atomically persist the report after every stage: multi-hour runs
    under an external timeout must not lose completed-stage results."""
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp, out_path)


def main(args):
    # the driver loads the SAME train/val r6d pickles once per config
    # (2 canonical + the finger-trend sweep); cache them read-only
    # across configs (train/data._load_clips_cached) — on this host
    # redundant multi-GB pickle loads cost minutes each (STATUS.md)
    os.environ.setdefault("MHPE_LOAD_DATA_CACHE", "1")
    work = os.path.abspath(args.work_dir)
    os.makedirs(work, exist_ok=True)
    model_dir = os.path.join(work, "models")
    os.makedirs(model_dir, exist_ok=True)
    # --resume: reuse stage results from a prior (partial) report, plus
    # on-disk artifacts (fixture pickles, training checkpoints) from an
    # interrupted run that never got to write its report.
    #
    # The report is flushed incrementally and a fresh run's EARLY flushes
    # (fixture stage) contain none of the prior stage entries yet — they
    # only re-enter the on-disk file as each stage re-merges them.  A run
    # killed inside that window leaves a STRIPPED report behind, and a
    # naive restart would silently re-train everything.  So: keep a
    # `.prior` backup, load whichever copy carries more stage results,
    # and refresh the backup before the first destructive flush.
    prior = _load_prior(args.out) if args.resume else {}
    prior_cfgs = prior.get("configs", {})
    report = {
        "scale": args.scale if not args.data_dir else "user-data",
        "epochs": args.epochs,
        "completed": False,
        "article_reference": ARTICLE_REFERENCE,
    }
    t_total = time.perf_counter()

    if not args.skip_raw_smoke:
        raw_out = os.path.join(work, "raw_processed")
        if "raw_pipeline_smoke" in prior:
            report["raw_pipeline_smoke"] = prior["raw_pipeline_smoke"]
        elif args.resume and os.path.exists(
            os.path.join(raw_out, "r6d_train.pkl")
        ):
            report["raw_pipeline_smoke"] = {
                "resumed": True, "artifacts": sorted(os.listdir(raw_out))
            }
            print("[raw smoke] resumed from on-disk artifacts", flush=True)
        else:
            report["raw_pipeline_smoke"] = stage_raw_smoke(work)
        _flush_report(report, args.out)

    fixture_pkl = os.path.join(work, "video_data", "r6d_train.pkl")
    # a fixture may only be reused if its categ_signal matches the
    # requested one (fixture_meta.json; fixtures from before the marker
    # existed are all default non-signal)
    fixture_meta = os.path.join(work, "video_data", "fixture_meta.json")
    on_disk = {}
    if os.path.exists(fixture_meta):
        with open(fixture_meta) as f:
            on_disk = json.load(f)
    if (
        args.resume
        and not args.data_dir
        and os.path.exists(fixture_pkl)
        and bool(on_disk.get("categ_signal", False)) == args.signal_fixture
        and bool(on_disk.get("finger_signal", False)) == args.finger_signal
        and on_disk.get("counts") == SCALES[args.scale]
    ):
        data_dir = os.path.join(work, "video_data")
        if "fingerprint" not in on_disk:
            # one-time upgrade of a pre-fingerprint fixture
            on_disk["fingerprint"] = _fixture_fingerprint(data_dir)
            with open(fixture_meta, "w") as f:
                json.dump(on_disk, f)
        fixture_info = {"source": "synthetic", "resumed": True,
                        "counts": SCALES[args.scale],
                        "categ_signal": args.signal_fixture,
                        "finger_signal": args.finger_signal,
                        "fingerprint": on_disk["fingerprint"]}
        print(f"[fixture] resumed from {data_dir}", flush=True)
    else:
        data_dir, fixture_info = stage_fixture(args, work)
    report["fixture"] = fixture_info
    if not args.data_dir:
        # Self-describing fixture semantics (VERDICT r4 weak #3): the
        # report must be readable WITHOUT STATUS.md.  Absolute numbers on
        # a synthetic fixture are not the article's; say exactly what
        # each stage can and cannot show on this fixture.
        notes = report["fixture_notes"] = {
            "n_classes": 9,
            "classifier_chance_acc": round(1.0 / 9, 4),
        }
        if not args.signal_fixture:
            notes["labels"] = (
                "signal-free: categoryID labels are independent of the "
                "pose/text streams by construction, so EVERY classifier "
                "accuracy below is expected to sit at chance (~0.111); "
                "the classifier stages here prove plumbing at article "
                "scale, not learning.  Run with --signal_fixture for a "
                "discriminative surrogate eval."
            )
        else:
            notes["labels"] = (
                "signal-bearing (categ_signal=True): each class plants a "
                "distinct angular oscillation in the pose streams and a "
                "centroid in the sentence embeddings, so classifier "
                "accuracies well above chance (~0.111) demonstrate "
                "actual learning.  NOTE: the class signature rides on "
                "the ARM channels too, so an enhanced-hands classifier "
                "can out-score the noisy GT hands by reading denoised "
                "arm-borne class signal — see anomaly_controls."
            )
        if args.finger_signal:
            notes["fingers"] = (
                "finger_signal=True: hand channels carry a Markov chain "
                "over the channel index rooted in a per-clip latent that "
                "the sentence embeddings also encode; recoverable "
                "information decays geometrically with distance from the "
                "nearest visible channel, so the masked-finger L1 trend "
                "(article Table 2's monotone 0.320->0.418 shape) is "
                "expected to RISE with K on this fixture."
            )
        elif args.fingers:
            notes["fingers"] = (
                "finger_signal=False: hand channels carry no "
                "text-predictable per-finger structure, so the "
                "masked-finger L1 trend is expected to be FLAT (plumbing "
                "only).  Run with --finger_signal for Table 2's shape."
            )
    _flush_report(report, args.out)

    # A REGENERATED synthetic fixture invalidates every downstream
    # resume artifact in this work dir: checkpoints, metrics, result
    # pickles and prior-report entries were all measured against the
    # old data (e.g. --resume with a flipped --signal_fixture or a
    # changed --scale).  User --data_dir is external and unchanged, so
    # stage resume stays valid there.
    stage_resume_ok = bool(args.data_dir) or fixture_info.get("resumed", False)
    if args.resume and not stage_resume_ok:
        # The synthetic fixture is deterministic: a REGENERATED fixture
        # whose content fingerprint matches the prior report's is
        # bit-identical to the data the surviving artifacts were
        # measured against, so stage resume stays valid.
        prior_fp = (prior.get("fixture") or {}).get("fingerprint")
        if prior_fp and prior_fp == fixture_info.get("fingerprint"):
            stage_resume_ok = True
            print("[resume] regenerated fixture fingerprint matches the "
                  "prior report — prior stage results stay valid",
                  flush=True)
    if args.resume and not stage_resume_ok:
        print("[resume] fixture was regenerated — prior stage results/"
              "checkpoints in this work dir refer to the OLD fixture "
              "and will NOT be reused", flush=True)
        # Legacy fallback (prior report predates the fingerprint): a
        # config's train entry may still be trusted if the stats npz its
        # training wrote is bitwise-reproduced by the regenerated data
        # (_stats_npz_matches).  Classifier/inference prior entries are
        # NOT kept — their on-disk result pickles were wiped with the
        # work dir and re-run from the validated checkpoint anyway.
        if not (prior.get("fixture") or {}).get("fingerprint"):
            kept = {}
            for name, pe in prior_cfgs.items():
                cfg = next((c for c in CONFIGS if c["name"] == name), None)
                if (
                    cfg is not None
                    and "train" in pe
                    and _stats_npz_matches(cfg, data_dir, model_dir)
                ):
                    kept[name] = {"train": pe["train"]}
                    print(f"[resume] {name}: stats npz bitwise-matches the "
                          "regenerated fixture — trusting the prior train "
                          "entry", flush=True)
            prior, prior_cfgs = ({"configs": kept} if kept else {}), kept
        else:
            prior, prior_cfgs = {}, {}

    report["configs"] = {}
    selected = (
        [c for c in CONFIGS if c["name"] in args.configs.split(",")]
        if args.configs else CONFIGS
    )
    if args.configs and len(selected) != len(args.configs.split(",")):
        raise SystemExit(
            f"--configs {args.configs!r}: unknown name "
            f"(have {[c['name'] for c in CONFIGS]})"
        )
    if not args.skip_classifier and CONFIGS[0] not in selected:
        raise SystemExit(
            f"the classifier stage consumes {CONFIGS[0]['name']}'s "
            "results; include it in --configs or pass --skip_classifier"
        )
    for cfg in selected:
        entry = {"pipeline": cfg["pipeline"], "model": cfg["model"],
                 "loss": cfg["loss"], "require_text": cfg["require_text"]}
        report["configs"][cfg["name"]] = entry
        prior_entry = prior_cfgs.get(cfg["name"], {})
        ckpt = os.path.join(model_dir, f"lastCheckpoint_{cfg['name']}.pkl")
        metrics = os.path.join(model_dir, f"metrics_{cfg['name']}.jsonl")
        stats_npz = os.path.join(
            model_dir,
            f"{cfg['name']}{cfg['pipeline']}_preprocess_core.npz",
        )
        # Inference needs the checkpoint AND the standardization stats
        # npz on disk — a prior-report train entry whose files were lost
        # (cleaned work dir from an earlier round) must re-train, not be
        # trusted, or every downstream stage crashes on a missing file.
        if "train" in prior_entry:
            _reconstitute_last_checkpoint(model_dir, cfg["name"])
        train_artifacts_ok = os.path.exists(ckpt) and os.path.exists(stats_npz)
        if "train" in prior_entry and not train_artifacts_ok:
            print(f"[train {cfg['name']}] prior report entry found but "
                  f"checkpoint/stats files are missing from {model_dir} "
                  f"— re-training", flush=True)
        if "train" in prior_entry and train_artifacts_ok:
            entry["train"] = prior_entry["train"]
        elif (
            args.resume
            and stage_resume_ok
            and train_artifacts_ok
            and os.path.exists(metrics)
            and _metrics_epochs_done(metrics) >= args.epochs
        ):
            entry["train"] = {
                "resumed": True, "best_val": _metrics_best_val(metrics),
                "best_val_epoch": _metrics_best_val_epoch(metrics),
                "epochs": args.epochs, "batch_size": args.batch_size,
                "learning_rate": cfg["learning_rate"],
            }
            print(f"[train {cfg['name']}] resumed: best val "
                  f"{entry['train']['best_val']:.4f} from {metrics}",
                  flush=True)
        else:
            entry["train"] = stage_train(cfg, data_dir, model_dir, args)
        _flush_report(report, args.out)
        def _on_split(res, entry=entry):
            entry["inference"] = res
            _flush_report(report, args.out)

        # prior inference L1s are only valid against the checkpoint they
        # were measured with: a re-trained config invalidates them
        entry["inference"] = stage_infer(
            cfg, data_dir, model_dir, args,
            prior=(prior_entry.get("inference")
                   if entry["train"] is prior_entry.get("train")
                   or entry["train"].get("resumed") else None),
            on_split=_on_split,
        )
        _flush_report(report, args.out)

    if not args.skip_classifier:
        # the article's surrogate eval (§5.2): GT sequences vs the
        # enhanced sequences written by config A's save_results — on the
        # SAME window subset with aligned labels (like-for-like)
        cls = report["classifier"] = dict(prior.get("classifier", {}))
        res_dir = os.path.join(work, f"results_{CONFIGS[0]['name']}")
        _sel_cache = {}

        def get_sel():
            if "sel" not in _sel_cache:
                _sel_cache["sel"] = {
                    s: _selection_indices(
                        res_dir, data_dir, s,
                        require_text=CONFIGS[0]["require_text"],
                    )
                    for s in ("train", "val")
                }
                cls["windows"] = {
                    s: len(_sel_cache["sel"][s]) for s in _sel_cache["sel"]
                }
            return _sel_cache["sel"]

        if "ground_truth_r6d" not in cls:
            sel = get_sel()
            gt_dir = os.path.join(work, "classifier_gt_subset")
            _build_gt_subset(data_dir, gt_dir, sel)
            cls["ground_truth_r6d"] = stage_classifier(
                "gt", gt_dir, data_dir, model_dir, args, sel=sel
            )
            _flush_report(report, args.out)
        if "enhanced_r6d" not in cls:
            cls["enhanced_r6d"] = stage_classifier(
                "enhanced", res_dir, data_dir, model_dir, args, sel=get_sel()
            )
            _flush_report(report, args.out)
        if (
            args.reference_classifier
            and "enhanced_r6d_reference_config" not in cls
        ):
            # the reference's OWN hyperparameters
            # (H2Sclassifier/Train_Test/main.py:143-160: hidden 1024 x
            # 10 layers x bidirectional), auto-remat keeps it inside a
            # 16 GB chip; epochs reduced via --reference_classifier_epochs
            rargs = argparse.Namespace(**vars(args))
            rargs.classifier_hidden = 1024
            rargs.classifier_layers = 10
            rargs.classifier_bidir = True
            rargs.classifier_epochs = args.reference_classifier_epochs
            cls["enhanced_r6d_reference_config"] = stage_classifier(
                "enhanced_refcfg", res_dir, data_dir, model_dir, rargs,
                sel=get_sel(),
            )
            _flush_report(report, args.out)
        if args.anomaly_controls:
            stage_anomaly_controls(cls, work, data_dir, model_dir, args,
                                   sel=get_sel())
            _flush_report(report, args.out)
        if "text_mlp" not in cls:
            cls["text_mlp"] = stage_mlp_classifier(data_dir, model_dir, args)
            _flush_report(report, args.out)

    # Tables 1 + §5.2 are done at this point; the finger trend below is
    # additive.  Record that separately so a run cut off mid-trend (e.g.
    # by a wall-clock deadline) still reports the core result honestly.
    report["core_completed"] = True
    _flush_report(report, args.out)

    if args.fingers:
        # the incremental finger-masking trend (article Table 2; the
        # launcher sweeps fingers 1..10, launch_exp_incr_fingers.sh:10):
        # one v2+text RobustLoss run per masked-finger count K, val/test
        # L1 recorded as the Table-2-shaped series.  Runs at
        # --finger_epochs (reduced from 200: the trend, not the absolute
        # numbers, is the object) and resumes per-K.
        ks = _parse_fingers(args.fingers)
        trend = report["finger_trend"] = dict(prior.get("finger_trend", {}))
        report["finger_trend_epochs"] = args.finger_epochs
        targs = argparse.Namespace(**vars(args))
        targs.epochs = args.finger_epochs
        for k in ks:
            key = str(k)
            entry = dict(trend.get(key, {}))
            trend[key] = entry
            cfg = dict(
                name=f"arm_wh2finger{k}_v2_text_RobustLoss_trend",
                model="v2", pipeline=f"arm_wh2finger{k}", loss="RobustLoss",
                require_text=True, learning_rate=1e-3,
            )
            ckpt = os.path.join(model_dir, f"lastCheckpoint_{cfg['name']}.pkl")
            metrics = os.path.join(model_dir, f"metrics_{cfg['name']}.jsonl")
            stats_npz = os.path.join(
                model_dir,
                f"{cfg['name']}{cfg['pipeline']}_preprocess_core.npz",
            )
            # same artifact check as the canonical configs: a prior
            # report 'train' entry whose checkpoint/stats were lost must
            # re-train, or downstream inference crashes on missing files
            if "train" in entry:
                _reconstitute_last_checkpoint(model_dir, cfg["name"])
            train_artifacts_ok = (
                os.path.exists(ckpt) and os.path.exists(stats_npz)
            )
            if "train" in entry and not train_artifacts_ok:
                print(f"[train {cfg['name']}] prior trend entry found but "
                      f"checkpoint/stats files are missing — re-training",
                      flush=True)
                del entry["train"]
                entry.pop("inference", None)
            if "train" not in entry:
                if (
                    args.resume
                    and stage_resume_ok
                    and train_artifacts_ok
                    and os.path.exists(metrics)
                    and _metrics_epochs_done(metrics) >= targs.epochs
                ):
                    entry["train"] = {
                        "resumed": True,
                        "best_val": _metrics_best_val(metrics),
                        "best_val_epoch": _metrics_best_val_epoch(metrics),
                        "epochs": targs.epochs,
                    }
                else:
                    entry["train"] = stage_train(cfg, data_dir, model_dir, targs)
                _flush_report(report, args.out)

            def _on_split(res, entry=entry):
                entry["inference"] = res
                _flush_report(report, args.out)

            entry["inference"] = stage_infer(
                cfg, data_dir, model_dir, args,
                prior=entry.get("inference"), on_split=_on_split,
                splits=("val", "test"),
            )
            _flush_report(report, args.out)
        report["finger_trend_vs_article"] = _finger_trend_comparison(trend)
        _flush_report(report, args.out)

    report["completed"] = True
    report["total_wall_s"] = time.perf_counter() - t_total
    _flush_report(report, args.out)
    print(f"\n=== ARTICLE REPLAY DONE in {report['total_wall_s']:.1f}s -> "
          f"{args.out}", flush=True)
    for name, entry in report["configs"].items():
        print(f"  {name}: L1 {entry['inference']['L1']} "
              f"(train {entry['train'].get('wall_s', 0.0):.1f}s)", flush=True)
    if "classifier" in report:
        print(f"  classifier: GT acc "
              f"{report['classifier']['ground_truth_r6d']['best_val_acc']:.3f}"
              f" / enhanced acc "
              f"{report['classifier']['enhanced_r6d']['best_val_acc']:.3f}",
              flush=True)
    return report


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", choices=sorted(SCALES), default="article",
                   help="synthetic fixture scale ('article' = the "
                   "published 31,128/1,741/2,322 split sizes)")
    p.add_argument("--data_dir", type=str, default=None,
                   help="existing processed pickles (e.g. real How2Sign); "
                   "skips synthetic fixture generation")
    p.add_argument("--work_dir", type=str, default="article_replay_work")
    p.add_argument("--out", type=str, default="ARTICLE_REPLAY.json")
    p.add_argument("--epochs", type=int, default=200,
                   help="GAN training epochs per config (article: 200)")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--num_samples", type=int, default=3000,
                   help="inference sample cap per split (reference "
                   "inference.py default 3000; its launcher uses 1000; "
                   "-1 = all windows)")
    p.add_argument("--no_epoch_scan", action="store_true",
                   help="disable the device-resident epoch scan")
    p.add_argument("--resume", action="store_true",
                   help="reuse completed stages: prior --out report "
                   "entries, the on-disk synthetic fixture, and finished "
                   "training checkpoints (multi-hour article-scale runs "
                   "survive interruption)")
    p.add_argument("--skip_raw_smoke", action="store_true")
    p.add_argument("--skip_classifier", action="store_true")
    p.add_argument("--configs", type=str, default="",
                   help="comma list restricting which canonical configs "
                   "run (names from CONFIGS; default: all).  The "
                   "classifier surrogate stage consumes the FIRST "
                   "config's results, so '--configs arm2wh_v1_L1' is "
                   "the minimal classifier-bearing run")
    p.add_argument("--signal_fixture", action="store_true",
                   help="generate the synthetic fixture with "
                   "categ_signal=True (label-dependent pose signature + "
                   "text class centroids, data/synthetic.py) so the "
                   "classifier surrogate eval (§5.2) measures actual "
                   "above-chance learning instead of plumbing; the "
                   "default fixture's labels are independent of the "
                   "pose streams, so its accuracies sit at chance")
    p.add_argument("--finger_signal", action="store_true",
                   help="generate the fixture with finger_signal=True "
                   "(data/synthetic.py): hand channels carry a Markov "
                   "chain over the channel index whose recoverable "
                   "information decays with distance from the nearest "
                   "visible channel, and whose clip-level latents ride "
                   "in the sentence embeddings — the structure the "
                   "masked-finger trend (--fingers) needs to reproduce "
                   "article Table 2's monotone shape instead of a flat "
                   "series")
    p.add_argument("--anomaly_controls", action="store_true",
                   help="ALSO train four ablation classifiers "
                   "(gt_arms_only / gt_hands_only / enhanced_hands_only "
                   "/ gt_arms_only_long at 3x budget) "
                   "that separate which channel stream carries the label "
                   "signal — the mechanism control for the enhanced>GT "
                   "accuracy anomaly on signal fixtures")
    p.add_argument("--fingers", type=str, default="",
                   help="comma list of masked-finger counts for the "
                   "incremental-masking trend (article Table 2 / "
                   "launch_exp_incr_fingers.sh:10), e.g. '1,2,3,4,5'; "
                   "each K trains arm_wh2fingerK (v2+text RobustLoss) "
                   "at --finger_epochs and records val/test L1")
    p.add_argument("--finger_epochs", type=int, default=50)
    # classifier stage defaults are scaled down from the reference's
    # (hidden 1024 x 10 bidir layers x 200 epochs would add hours at
    # article scale); pass the reference values explicitly to reproduce
    # H2Sclassifier/Train_Test/main.py:143-160
    p.add_argument("--classifier_epochs", type=int, default=10)
    p.add_argument("--classifier_batch", type=int, default=128)
    p.add_argument("--classifier_hidden", type=int, default=256)
    p.add_argument("--classifier_layers", type=int, default=2)
    p.add_argument("--classifier_bidir", action="store_true")
    p.add_argument("--reference_classifier", action="store_true",
                   help="ALSO train the enhanced-r6d classifier at the "
                   "reference's own config (hidden 1024 x 10 layers x "
                   "bidir, H2Sclassifier/Train_Test/main.py:143-160; "
                   "auto-remat) at --reference_classifier_epochs")
    p.add_argument("--reference_classifier_epochs", type=int, default=20)
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())

"""End-to-end slice: synthetic r6d dataset -> GAN training (G+D epochs,
best-val checkpoint) -> inference from the checkpoint -> r6d/aa/xyz result
pickles.  Exercises the full train/infer contract on the CPU mesh."""

import os

import numpy as np
import pytest

import inference as inference_cli
import train_gan as train_cli
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import synthetic
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import load_binary


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    synthetic.make_r6d_dataset(
        os.path.join(d, "video_data"), n_clips=8, t_range=(60, 230), seed=11
    )
    return d


def _train_args(workdir, **over):
    parser = train_cli.build_parser()
    args = parser.parse_args([])
    args.base_path = str(workdir)
    args.data_dir = os.path.join(workdir, "video_data")
    args.model_path = os.path.join(workdir, "models")
    args.num_epochs = 4
    args.batch_size = 4
    args.epochs_train_disc = 3
    args.exp_name = "e2e"
    for k, v in over.items():
        setattr(args, k, v)
    return args


@pytest.mark.slow
def test_train_then_infer_arm2wh(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    args = _train_args(workdir)
    best = train_cli.main(args)
    assert np.isfinite(best)
    ckpt = os.path.join(workdir, "models", "e2e_checkpoint.pkl")
    assert os.path.exists(ckpt)
    assert os.path.exists(
        os.path.join(workdir, "models", "lastCheckpoint_e2e.pkl")
    )
    assert os.path.exists(
        os.path.join(workdir, "models", "e2earm2wh_preprocess_core.npz")
    )

    iargs = inference_cli.build_parser().parse_args([])
    iargs.checkpoint = ckpt
    iargs.base_path = str(workdir)
    iargs.data_dir = os.path.join(workdir, "video_data")
    iargs.exp_name = "e2e"
    iargs.batch_size = 4
    iargs.seqs_to_viz = 1
    err = inference_cli.main(iargs)
    assert np.isfinite(err)

    res = os.path.join(workdir, "results_e2e")
    r6d = load_binary(os.path.join(res, "r6d_test.pkl"))
    aa = load_binary(os.path.join(res, "aa_test.pkl"))
    xyz = load_binary(os.path.join(res, "xyz_test.pkl"))
    assert r6d.shape[2] == 36 + 252  # arms input + enhanced hands
    assert aa.shape[2] == (36 + 252) // 2
    assert xyz[0].shape[1] == 150
    assert not np.any(np.isnan(xyz[0]))
    # viz produced a GIF
    assert os.path.exists(os.path.join(workdir, "viz_results_e2e_test", "0.gif"))


@pytest.mark.slow
def test_train_robust_loss_and_label_smooth(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    args = _train_args(
        workdir,
        loss="RobustLoss",
        disc_label_smooth=True,
        exp_name="e2e_robust",
        num_epochs=2,
    )
    best = train_cli.main(args)
    assert np.isfinite(best)


@pytest.mark.slow
def test_train_infer_embeds_type_average(workdir, monkeypatch):
    """--embeds_type average trains and infers end-to-end off the
    average_{split}_sentence_embeddings pickles (the launcher's other
    sweep axis; reference proc_text.py:133-139, train_gan --embeds_type)."""
    monkeypatch.chdir(workdir)
    args = _train_args(
        workdir,
        model="v2",
        pipeline="arm_wh2finger1",
        require_text=True,
        embeds_type="average",
        exp_name="e2e_avg",
        num_epochs=2,
    )
    best = train_cli.main(args)
    assert np.isfinite(best)
    iargs = inference_cli.build_parser().parse_args([])
    iargs.checkpoint = os.path.join(workdir, "models", "e2e_avg_checkpoint.pkl")
    iargs.base_path = str(workdir)
    iargs.data_dir = os.path.join(workdir, "video_data")
    iargs.exp_name = "e2e_avg"
    iargs.model = "v2"
    iargs.pipeline = "arm_wh2finger1"
    iargs.require_text = True
    iargs.embeds_type = "average"
    iargs.batch_size = 4
    iargs.seqs_to_viz = 0
    err = inference_cli.main(iargs)
    assert np.isfinite(err)
    # result rows map back to original clips (sel_indices contract)
    sel = load_binary(
        os.path.join(workdir, "results_e2e_avg", "sel_indices_test.pkl")
    )
    r6d = load_binary(os.path.join(workdir, "results_e2e_avg", "r6d_test.pkl"))
    assert len(sel) == r6d.shape[0]
    assert sorted(set(sel)) == sel  # strictly increasing original indices


@pytest.mark.slow
def test_train_infer_image_conditioned_b2h(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    args = _train_args(
        workdir, model="b2h", require_image=True, exp_name="e2e_b2h", num_epochs=2
    )
    best = train_cli.main(args)
    assert np.isfinite(best)
    iargs = inference_cli.build_parser().parse_args([])
    iargs.checkpoint = os.path.join(workdir, "models", "e2e_b2h_checkpoint.pkl")
    iargs.base_path = str(workdir)
    iargs.data_dir = os.path.join(workdir, "video_data")
    iargs.exp_name = "e2e_b2h"
    iargs.model = "b2h"
    iargs.require_image = True
    iargs.batch_size = 4
    iargs.seqs_to_viz = 0
    err = inference_cli.main(iargs)
    assert np.isfinite(err)


@pytest.mark.slow
def test_train_arm_wh2wh_pipeline(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    args = _train_args(
        workdir, pipeline="arm_wh2wh", exp_name="e2e_awh", num_epochs=2, default_size=64
    )
    best = train_cli.main(args)
    assert np.isfinite(best)


@pytest.mark.slow
def test_resume_from_checkpoint(workdir, monkeypatch):
    """--use_checkpoint picks up lastCheckpoint and keeps training
    (reference train_gan.py:70-73 semantics)."""
    monkeypatch.chdir(workdir)
    args = _train_args(workdir, exp_name="e2e_resume", num_epochs=2, default_size=64)
    train_cli.main(args)
    args2 = _train_args(
        workdir,
        exp_name="e2e_resume",
        num_epochs=2,
        use_checkpoint=True,
        default_size=64,
    )
    best = train_cli.main(args2)
    assert np.isfinite(best)

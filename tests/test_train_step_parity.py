"""Numeric train-step parity vs a torch reconstruction of the reference
GAN step (train_gan.py:215-254 D / :258-297 G): loss values, post-Adam
parameter deltas, and train-mode BN running-stat updates, from ported
initial weights with dropout off.

This is the BASELINE.json "train_gan.py train step (robust loss)" tracked
config; the heavy lifting lives in parity_harness.train_step_parity so the
harness and this test share one implementation.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not mounted", allow_module_level=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import parity_harness  # noqa: E402


@pytest.mark.parametrize("loss", ["RobustLoss", "L1"])
def test_train_step_matches_torch_reference(loss):
    errs = parity_harness.train_step_parity(quick=True, loss=loss)
    assert errs["g_loss_err"] <= 1e-4, errs
    assert errs["g_param_err"] <= 1e-4, errs
    assert errs["g_stats_err"] <= 1e-4, errs
    assert errs["d_loss_err"] <= 1e-4, errs
    assert errs["d_param_err"] <= 1e-4, errs
    assert errs["d_stats_err"] <= 1e-4, errs
    # only a vanishing fraction of entries may sit in the f32-noise band
    # 0 < |grad| < 1e-6 where Adam's first-step direction is undefined
    assert errs["g_masked_frac"] <= 1e-3, errs
    assert errs["d_masked_frac"] <= 1e-3, errs

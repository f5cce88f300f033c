"""Statistical training-convergence comparison vs the torch reference
loop (VERDICT r1 item 3): identical data, identical ported init weights,
identical shuffle stream and epoch schedule — trajectories must track
within a band (dropout streams differ by framework, so no bit-match).

Heavier than a unit test; runs with `pytest -m slow`.  The 50-epoch
result lives in CONVERGENCE.json (final val rel diff ~0.4%, train
trajectory correlation ~0.999).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not mounted", allow_module_level=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import convergence_compare  # noqa: E402


@pytest.mark.slow
def test_training_converges_like_torch_reference():
    res = convergence_compare.compare(epochs=12, n=64, batch_size=16, lr=1e-3)
    # both frameworks learn: VAL loss (pure reconstruction) must decrease.
    # The G train loss includes the adversarial MSE term, which legitimately
    # GROWS as D improves on its every-3rd-epoch schedule — both torch and
    # jax train losses drift up together at this scale, so train loss is
    # asserted only through the trajectory band below, not monotonicity.
    assert res["jax_val"][-1] < res["jax_val"][0]
    assert res["torch_val"][-1] < res["torch_val"][0]
    # ... along statistically matching trajectories
    assert res["final_val_rel_diff"] < 0.05, res
    assert res["train_traj_corr"] > 0.95, res
    assert res["train_traj_max_rel_diff"] < 0.10, res

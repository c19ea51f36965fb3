"""Training-objective drift guard for the jit-ability loss redesigns.

Reduced-batch version of scripts/loss_drift_study.py (which writes
docs/LOSS_DRIFT.md at full batch count): runs the EXACT reference LocalSSI /
EdgeGuidedLocalSSI (/root/reference/unidepth/ops/losses/local_ssi.py,
executed directly) against the JAX redesigns and pins

  * aligned-mode equality (reference pinned to the redesign's deterministic
    choices) to fp32 rounding, and
  * design-mode gradient cosine at or above the reference's own
    leave-one-out draw agreement (the statistical-negligibility criterion —
    see docs/LOSS_DRIFT.md).
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference mount absent"),
]


@pytest.fixture(scope="module")
def study():
    spec = importlib.util.spec_from_file_location(
        "loss_drift_study", REPO / "scripts" / "loss_drift_study.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["loss_drift_study"] = mod
    spec.loader.exec_module(mod)
    mod.REF_LS = mod.load_reference_losses()
    return mod


B, H, W = 2, 168, 168  # 12x12 1/14 grid; smaller than the study's 224


def test_localssi_drift(study):
    aligned, design = study.study_localssi(study.REF_LS, 3, 6, B, H, W)
    assert aligned[:, 0].max() < 1e-5, "aligned loss mismatch — shared math broke"
    assert aligned[:, 1].min() > 0.9999, "aligned grad mismatch"
    # redesign's cosine to the expected gradient >= the reference's own
    # draw agreement (small slack for draw-estimate noise at 6 draws)
    assert np.mean(design[:, 2]) > np.mean(design[:, 4]) - 0.05, (
        f"LocalSSI design drift: cosine {np.mean(design[:, 2]):.3f} vs "
        f"LOO yardstick {np.mean(design[:, 4]):.3f}"
    )
    assert np.mean(design[:, 0]) < 0.10, "LocalSSI loss-value drift >10%"


def test_edge_guided_drift(study):
    aligned, design = study.study_edge(study.REF_LS, 3, 6, B, H, W)
    assert aligned[:, 0].max() < 1e-5, "aligned loss mismatch — shared math broke"
    assert aligned[:, 1].min() > 0.9999, "aligned grad mismatch"
    assert np.mean(design[:, 2]) > np.mean(design[:, 4]) - 0.05, (
        f"EdgeGuided design drift: cosine {np.mean(design[:, 2]):.3f} vs "
        f"LOO yardstick {np.mean(design[:, 4]):.3f}"
    )
    assert np.mean(design[:, 0]) < 0.10, "EdgeGuided loss-value drift >10%"

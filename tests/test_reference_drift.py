"""Epoch-scale parity-drift horizon (VERDICT r4 item 6).

test_reference_train_parity runs 20 side-by-side steps per family; this
module extends the SAME harness to 200 steps for mnist_digit 'ours' (100
sg-phase + 100 fitted-GM steps at the harness's CPU shapes) and measures
how the framework divergence GROWS: f32 accumulation differences (TF-CPU
oneDNN vs XLA conv reduction order) compound through Adam, and "20-step
parity at f32 tolerance" is only meaningful if divergence stays bounded
over an epoch-scale horizon rather than compounding geometrically.

Measured at HEAD (PARITY_DRIFT_r05.json, the committed curve): the inner
VAE trains through a fast transient around the phase boundary (elbo_prior
traverses ~1,600 units in a few dozen steps) where its std heads ride the
relu(x)+precision kink (models.py:90-95 parameterisation), so POINTWISE
relative divergence briefly reads ~20% on curves whose magnitude passes
through zero — while the ABSOLUTE divergence never exceeds 0.93 on the
502-unit loss_ae and 0.52 on the 1,624-unit elbo_prior. The honest scale
is each curve's dynamic range: range-normalised divergence peaks at 3.5%
(entropy_z) / 2.1% (entropy_t) in the third quarter and RE-CONTRACTS in
the fourth (0.8% / 0.3%) — bounded random-walk noise through a chaotic
training window, not geometric compounding.

The committed artifact is refreshed with LADDER_WRITE_DRIFT=1.
"""

import json
import os

import numpy as np
import pytest

from tests.test_reference_train_parity import (
    COMMON_KEYS, FAMILIES, INNER_KEYS, _run_parity)

S_SG, S_GM = 100, 100
S = S_SG + S_GM
KEYS = COMMON_KEYS + INNER_KEYS
# keys whose magnitude stays O(100): pointwise relative bounds are
# meaningful for these (the others cross zero mid-run)
STABLE_KEYS = ("loss_ae", "elbo", "l1_reconstruction_error",
               "sigma_regularisor", "sigma", "inner_sigma")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def drift(tmp_path_factory):
    """200-step side-by-side run; returns per-key divergence curves, both
    pointwise-normalised (|a-b|/max(|ref|,1)) and range-normalised
    (|a-b|/max(range(ref),1e-2))."""
    pytest.importorskip("tensorflow")
    # inserted at fixture RUNTIME (collection of the parametrised 20-step
    # tests over list(FAMILIES) has already happened), removed after
    FAMILIES["ours_drift"] = dict(FAMILIES["ours"], prior="ours",
                                  steps=(S_SG, S_GM))
    try:
        cfg, ref, ours, _ = _run_parity(
            "ours_drift", tmp_path_factory.mktemp("refexec_drift"))
    finally:
        del FAMILIES["ours_drift"]

    point, ranged = {}, {}
    for k in KEYS:
        a = np.asarray(ours[k], np.float64)
        b = np.asarray(ref[k], np.float64)
        point[k] = np.abs(a - b) / np.maximum(np.abs(b), 1.0)
        ranged[k] = np.abs(a - b) / max(b.max() - b.min(), 1e-2)
    return dict(cfg=cfg, point=point, ranged=ranged)


def _quarters(c):
    return [float(c[i * 50:(i + 1) * 50].max()) for i in range(4)]


def test_range_normalised_drift_stays_bounded(drift):
    """Every trajectory key stays within 8% of its own dynamic range over
    all 200 steps (measured max 3.5%, entropy_z; ~2x headroom for
    compiler/BLAS version noise)."""
    worst = {k: float(v.max()) for k, v in drift["ranged"].items()}
    bad = {k: w for k, w in worst.items() if w > 0.08}
    assert not bad, f"epoch-scale range-normalised divergence: {bad}"


def test_stable_keys_stay_at_f32_parity(drift):
    """The outer-VAE training signal itself never leaves the f32 parity
    band: pointwise-normalised divergence <= 1.5e-2 over all 200 steps
    (measured max 2.7e-3 on loss_ae)."""
    for k in STABLE_KEYS:
        worst = float(drift["point"][k].max())
        assert worst < 1.5e-2, (k, worst)


def test_drift_recontracts_not_compounds(drift):
    """Divergence may accumulate through the chaotic mid-run transient but
    must not compound: for every key whose range-normalised divergence
    peaks above 0.5%, the final quarter sits BELOW the peak quarter —
    the trajectories re-converge once the transient passes (measured:
    entropy_z 3.5% -> 0.8%, entropy_t 2.1% -> 0.3%)."""
    for k, c in drift["ranged"].items():
        qs = _quarters(c)
        peak = max(qs)
        if peak <= 5e-3:
            continue
        assert qs[3] < peak, (
            f"{k}: divergence still at its peak in the final quarter "
            f"(quarters {qs}) — compounding, not re-contracting")


def test_write_drift_artifact(drift):
    """LADDER_WRITE_DRIFT=1 refreshes PARITY_DRIFT_r05.json."""
    if not os.environ.get("LADDER_WRITE_DRIFT"):
        pytest.skip("artifact write not requested")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ranged_curve = np.zeros(S)
    for v in drift["ranged"].values():
        ranged_curve = np.maximum(ranged_curve, v)
    point_curve = np.zeros(S)
    for v in drift["point"].values():
        point_curve = np.maximum(point_curve, v)
    rec = {
        "what": ("per-step framework divergence over 200 side-by-side "
                 "train steps (100 sg + 100 fitted-GM) vs the reference's "
                 "own executing train ops, mnist_digit 'ours', CPU harness "
                 "shapes (B=16, h=64, z=8, t=2); range = |ours-ref| / "
                 "dynamic range of the reference curve, point = "
                 "|ours-ref| / max(|ref|, 1)"),
        "steps": S,
        "range_normalised": {
            "max": float(ranged_curve.max()),
            "argmax": int(ranged_curve.argmax()),
            "quarter_maxes": _quarters(ranged_curve),
            "per_key_max": {k: float(v.max())
                            for k, v in drift["ranged"].items()},
            "curve": [round(float(x), 6) for x in ranged_curve],
        },
        "point_normalised": {
            "max": float(point_curve.max()),
            "per_key_max": {k: float(v.max())
                            for k, v in drift["point"].items()},
            "stable_keys_max": max(float(drift["point"][k].max())
                                   for k in STABLE_KEYS),
        },
    }
    with open(os.path.join(repo, "PARITY_DRIFT_r05.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote PARITY_DRIFT_r05.json:",
          rec["range_normalised"]["quarter_maxes"])

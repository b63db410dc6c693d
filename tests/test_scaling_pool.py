"""bench_scaling.py --pool: leg-pooled efficiency estimators.

Pure-python (no Spark): feeds synthetic SCALING_*.json samples through
``pool()`` and checks the estimators against hand-computed values, plus the
guard on too-few samples.  The real artifacts under bench_out/ are exercised
by running ``python bench_scaling.py --pool`` (BASELINE.md's reproduction
command); this test pins the arithmetic that command relies on.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import pool  # noqa: E402


def _write_sample(dirpath, name, t2, t8):
    eff = round((t2 / t8) / 4, 3)
    doc = {
        "levels": [2, 8],
        "runs": {
            "2": {"t_total": t2},
            "8": {"t_total": t8},
        },
        "efficiency_2_to_8": eff,
    }
    with open(os.path.join(dirpath, name), "w") as f:
        json.dump(doc, f)
    return eff


def test_pool_estimators_hand_computed(tmp_path, capsys):
    # three samples with uncorrelated leg jitter: per-sample ratios spread
    # while the pooled estimators sit between them
    e1 = _write_sample(tmp_path, "SCALING_x_a.json", 520.0, 160.0)  # 0.812
    e2 = _write_sample(tmp_path, "SCALING_x_b.json", 600.0, 170.0)  # 0.882
    e3 = _write_sample(tmp_path, "SCALING_x_c.json", 540.0, 180.0)  # 0.750
    rep = pool("SCALING_x_*.json", out_dir=str(tmp_path))
    capsys.readouterr()  # pool() prints its report; keep test output clean

    assert rep["samples"] == ["SCALING_x_a.json", "SCALING_x_b.json",
                              "SCALING_x_c.json"]
    assert rep["levels"] == [2, 8]
    assert rep["per_sample_eff"] == [e1, e2, e3]
    # min legs: 520 / (4 * 160)
    assert rep["pooled_best_legs_eff"] == round(520.0 / 640.0, 3)
    # median legs: 540 / (4 * 170)
    assert rep["pooled_median_legs_eff"] == round(540.0 / 680.0, 3)
    assert rep["per_sample_median_eff"] == e1  # middle of .750/.812/.882
    assert rep["per_sample_mean_eff"] == round((e1 + e2 + e3) / 3, 3)
    # relative sds are percentages of the mean, 1-decimal
    assert rep["t2_rel_sd_pct"] > 0 and rep["t8_rel_sd_pct"] > 0


def test_pool_refuses_mixed_levels(tmp_path, capsys):
    _write_sample(tmp_path, "SCALING_m_a.json", 520.0, 160.0)
    with open(os.path.join(tmp_path, "SCALING_m_b.json"), "w") as f:
        json.dump({"levels": [8, 32],
                   "runs": {"8": {"t_total": 160.0},
                            "32": {"t_total": 80.0}},
                   "efficiency_8_to_32": 0.5}, f)
    with pytest.raises(SystemExit, match="mix parallelism levels"):
        pool("SCALING_m_*.json", out_dir=str(tmp_path))


def test_pool_requires_two_samples(tmp_path):
    _write_sample(tmp_path, "SCALING_only.json", 500.0, 150.0)
    with pytest.raises(SystemExit):
        pool("SCALING_only.json", out_dir=str(tmp_path))


def test_pool_matches_published_round5_artifacts():
    """The BASELINE.md 'Leg-pooled robustness estimate' numbers must stay
    reproducible from the committed bench_out artifacts."""
    rep = pool("SCALING_r5*.json")
    assert len(rep["samples"]) >= 6
    assert rep["pooled_best_legs_eff"] >= 0.8
    assert rep["pooled_median_legs_eff"] >= 0.8
    assert rep["per_sample_median_eff"] >= 0.8

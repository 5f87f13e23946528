"""Independent-reference rescoring (scripts/rescore_validation.py)."""

import importlib.util
import os

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "rescore_validation",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "rescore_validation.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
rescore = _mod.rescore


def _mk(k, pk_a, pk_b, rows, timesteps=100):
    sweep = {
        "k_bins": list(k),
        "pk_ddpm_ref": list(pk_a),
        "timesteps": timesteps,
        "rows": [
            {"config": f"DDPM {timesteps} (reference math)",
             "steps": timesteps, "pk": list(pk_a)},
            {"config": f"DDPM {timesteps}, independent seed",
             "steps": timesteps, "pk": list(pk_b)},
        ],
    }
    val = {"timesteps": timesteps, "rows": rows}
    return sweep, val


def test_rescore_scores_against_seed_b():
    k = np.array([0.0, 1.0, 2.0, 3.0])
    pk_a = np.array([1.0, 10.0, 10.0, 10.0])
    pk_b = np.array([1.0, 10.2, 10.0, 10.0])  # 2% off in one bin -> floor 2%
    row = {"config": "fast + calib", "steps": 10, "maps_per_min": 999.0,
           "max_err_vs_ddpm1500_pct": 0.0, "mean_err_vs_ddpm1500_pct": 0.0,
           "pk": list(pk_a)}  # identical to seed A
    sweep, val = _mk(k, pk_a, pk_b, [row])
    out = rescore(sweep, val)
    # floor = |A/B - 1| max ~= 1.96%; tolerance = max(1%, floor)
    assert abs(out["noise_floor_max_pct_indep"] - 1.96) < 0.02
    r = out["rows"][0]
    # the row equals seed A, so its independent error equals the floor -> certified
    assert abs(r["max_err_vs_indep_pct"] - out["noise_floor_max_pct_indep"]) < 1e-9
    assert out["certified_configs_independent"] == ["fast + calib"]


def test_rescore_rejects_above_tolerance_and_skips_ref_rows():
    k = np.array([0.0, 1.0, 2.0])
    pk_a = np.array([1.0, 10.0, 10.0])
    pk_b = np.array([1.0, 10.05, 10.0])  # floor 0.5% -> tolerance 1%
    bad = {"config": "too far", "steps": 10, "maps_per_min": 1.0,
           "max_err_vs_ddpm1500_pct": 0.0, "mean_err_vs_ddpm1500_pct": 0.0,
           "pk": [1.0, 10.5, 10.0]}  # 4.5% off seed B
    ref_row = {"config": "DDPM 100 (reference math)", "steps": 100,
               "maps_per_min": 1.0, "max_err_vs_ddpm1500_pct": 0.0,
               "mean_err_vs_ddpm1500_pct": 0.0, "pk": list(pk_a)}
    sweep, val = _mk(k, pk_a, pk_b, [ref_row, bad])
    out = rescore(sweep, val)
    assert out["certify_tolerance_pct_indep"] == 1.0
    assert out["certified_configs_independent"] == []  # ref row never certifies


def test_rescore_requires_throughput_bar():
    # A row inside spectral tolerance but below 500 maps/min must NOT land in
    # certified_configs_independent: certification is BOTH north-star clauses.
    k = np.array([0.0, 1.0, 2.0, 3.0])
    pk_a = np.array([1.0, 10.0, 10.0, 10.0])
    pk_b = np.array([1.0, 10.2, 10.0, 10.0])
    slow = {"config": "accurate but slow", "steps": 10, "maps_per_min": 300.0,
            "max_err_vs_ddpm1500_pct": 0.0, "mean_err_vs_ddpm1500_pct": 0.0,
            "pk": list(pk_a)}
    fast = {"config": "accurate and fast", "steps": 10, "maps_per_min": 800.0,
            "max_err_vs_ddpm1500_pct": 0.0, "mean_err_vs_ddpm1500_pct": 0.0,
            "pk": list(pk_a)}
    sweep, val = _mk(k, pk_a, pk_b, [slow, fast])
    out = rescore(sweep, val)
    assert out["certified_configs_independent"] == ["accurate and fast"]

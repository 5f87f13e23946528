"""bench.py self-test: both modes emit a valid one-line JSON contract."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(os.environ)
    env.update(
        {
            # JAX_PLATFORMS alone is NOT enough: the axon TPU plugin ignores
            # the env var (CLAUDE.md), so without CAMELS_FORCE_CPU these
            # subprocesses would silently grab the real chip — and fail
            # whenever another process (a certification run) holds it.
            "JAX_PLATFORMS": "cpu",
            "CAMELS_FORCE_CPU": "1",
            "BENCH_BATCH": "2",
            "BENCH_TIMESTEPS": "4",
            "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
        }
    )
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=500,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-800:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    return json.loads(lines[0])


@pytest.mark.slow
def test_bench_sampling_contract():
    res = _run_bench({})
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in res
    assert res["unit"] == "maps/min/chip"
    assert res["value"] > 0


@pytest.mark.slow
def test_bench_train_contract():
    res = _run_bench({"BENCH_MODE": "train"})
    assert res["unit"] == "imgs/sec/chip"
    assert res["value"] > 0


@pytest.mark.slow
def test_bench_serving_contract():
    # Tiny strided run; no committed calibration exists for 2 steps, so the
    # default resolution must fall back to uncalibrated.
    res = _run_bench({"BENCH_MODE": "serving", "BENCH_SERVING_STEPS": "2"})
    assert res["unit"] == "maps/min/chip"
    assert res["serving_steps"] == 2
    assert res["sigma_mode"] == "beta"
    assert res["guide_w"] == 0.0  # certified row's guidance setting
    assert res["calibrated"] is False


def test_certified_serving_summary():
    sys.path.insert(0, REPO)
    try:
        from bench import _committed_checkpoint_md5, certified_serving_summary
    finally:
        sys.path.remove(REPO)
    import glob as _glob

    art = os.path.join(REPO, "artifacts", "certification")
    ckpt_md5 = _committed_checkpoint_md5(art)
    stamped = []
    for p in _glob.glob(os.path.join(art,
                                     "validation_w*_calibrated.indep.json")):
        with open(p) as f:
            if json.load(f).get("checkpoint_fingerprint") == ckpt_md5:
                stamped.append(p)
    rows = certified_serving_summary()
    if not stamped:
        # Between a checkpoint refresh and the certification re-run, every
        # committed artifact is (correctly) dropped by the stamp guard.
        assert rows == []
        pytest.skip("no committed validation artifact matches the committed "
                    "checkpoint — certification refresh pending")
    # The committed w=0 certification must surface; each entry carries the
    # fields the round artifact needs, and the certified row beats the bar.
    assert any(r["guide_w"] == 0.0 for r in rows)
    for r in rows:
        for key in ("config", "maps_per_min", "max_err_vs_indep_pct",
                    "noise_floor_max_pct", "checkpoint_fingerprint"):
            assert key in r
        assert r["checkpoint_fingerprint"] == ckpt_md5
        assert r["maps_per_min"] >= 500
        assert r["max_err_vs_indep_pct"] <= r["noise_floor_max_pct"]


def test_default_calibration_path_resolution():
    sys.path.insert(0, REPO)
    try:
        from bench import default_calibration_path
    finally:
        sys.path.remove(REPO)
    # The committed certified w=0 artifacts resolve; unknown pairs don't.
    p = default_calibration_path(0.0, 430)
    assert p is not None and p.endswith("calib_w0_430.npz")
    assert default_calibration_path(0.0, 2) is None
    assert default_calibration_path(7.0, 430) is None


def test_default_calibration_path_rejects_fractional_guidance():
    # Calibration fits are guidance-specific; w=0.5 must not silently resolve
    # the w=0 artifact via int() truncation.
    sys.path.insert(0, REPO)
    try:
        from bench import default_calibration_path
    finally:
        sys.path.remove(REPO)
    assert default_calibration_path(0.5, 430) is None
    assert default_calibration_path(2.9, 500) is None
    # Integral floats still resolve.
    assert default_calibration_path(0.0, 430) is not None


@pytest.mark.slow
def test_bench_sharded_sample_contract():
    # Mesh-sharded sampling over an 8-device virtual CPU mesh: the JSON must
    # report per-device batch math and a scaling efficiency.
    res = _run_bench({
        "BENCH_MODE": "sharded_sample",
        "CAMELS_FORCE_CPU": "1",
        "CAMELS_CPU_DEVICES": "8",
    })
    assert res["unit"] == "maps/min/chip"
    assert res["n_devices"] == 8
    assert res["batch_per_chip"] == 2
    assert res["total_batch"] == 16
    assert res["value"] > 0
    assert 0 < res["scaling_efficiency"]

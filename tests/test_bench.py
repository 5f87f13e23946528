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
            "JAX_PLATFORMS": "cpu",
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

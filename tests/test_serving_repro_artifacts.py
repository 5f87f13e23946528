"""Committed serving-reproduction artifacts stay consistent with the rows
they claim to reproduce.

scripts/reproduce_certified_serving.sh commits one BENCH_MODE=serving JSON
per guidance setting (artifacts/diagnostics_r5/serving_repro_w{0,2}.json),
cited from README's benchmarks section as proof the certified 1201.5 / 722
maps/min configurations reproduce end-to-end from the repo alone.  This
guard keeps those committed claims honest at HEAD:

* each artifact's ``checkpoint_fingerprint`` must equal the md5 of the
  committed checkpoint (same stamp contract as bench.certified_serving_summary);
* its ``certified_maps_per_min`` must match the certified row bench.py's
  resolver would quote today for that guidance setting;
* the measured throughput must sit within a loose 5% of the certified
  number (the per-metric sampling spread in README is ~±2%; 5% catches a
  committed repro that actually disagreed without flaking on chip noise).
"""

import hashlib
import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIAG = os.path.join(REPO, "artifacts", "diagnostics_r5")
CKPT = os.path.join(
    REPO, "artifacts", "certification", "model", "train_state.msgpack"
)


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_for_repro_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _repro_paths():
    if not os.path.isdir(DIAG):
        return []
    return sorted(
        os.path.join(DIAG, f)
        for f in os.listdir(DIAG)
        if f.startswith("serving_repro_w") and f.endswith(".json")
    )


@pytest.fixture(scope="module")
def ckpt_md5():
    if not os.path.isfile(CKPT):
        pytest.skip("no committed certification checkpoint")
    h = hashlib.md5()
    with open(CKPT, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


@pytest.fixture(scope="module")
def certified_rows():
    bench = _load_bench()
    rows = bench.certified_serving_summary()
    return {float(r["guide_w"]): r for r in rows}


def test_repro_artifacts_exist():
    # README cites both; the docs-integrity test already asserts the paths,
    # this pins that BOTH guidance settings are covered.
    ws = {os.path.basename(p) for p in _repro_paths()}
    assert {"serving_repro_w0.json", "serving_repro_w2.json"} <= ws


@pytest.mark.parametrize("path", _repro_paths() or [None])
def test_repro_matches_certified_row(path, ckpt_md5, certified_rows):
    if path is None:
        pytest.skip("no serving reproduction artifacts committed")
    with open(path) as f:
        d = json.loads(f.read().strip())
    assert d["checkpoint_fingerprint"] == ckpt_md5, (
        f"{path} was produced against a different checkpoint"
    )
    w = float(d["guide_w"])
    row = certified_rows.get(w)
    assert row is not None, (
        f"{path}: no certified row resolves for guide_w={w} at HEAD"
    )
    assert d["certified_config"] == row["config"]
    assert d["certified_maps_per_min"] == pytest.approx(
        row["maps_per_min"], rel=1e-9
    ), f"{path} quotes a stale certified_maps_per_min"
    rel = abs(d["value"] - row["maps_per_min"]) / row["maps_per_min"]
    assert rel <= 0.05, (
        f"{path}: measured {d['value']} is {rel:.1%} from the certified "
        f"{row['maps_per_min']} — the committed reproduction disagrees with "
        "the row it claims to reproduce"
    )

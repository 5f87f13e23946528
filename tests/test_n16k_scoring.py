"""Three-reference N=16384 final scoring (scripts/score_n16k_final.py).

The round-4 confirmation protocol: refit calibration fitted on seed A only,
validation scored against the untouched mean(B, C) with the LITERAL 1%
tolerance.  These tests pin the gate logic, the reference bookkeeping, and
the provenance checks on synthetic jsons.
"""

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from camels_diffusion_model_tpu.ops.spectrum import _linear_bin_info

SCRIPT = (pathlib.Path(__file__).parent.parent / "scripts"
          / "score_n16k_final.py")


def _mk_jsons(tmp_path, val_offset_pct=0.5, maps_per_min=722.0,
              pdf_tv=0.0, bpd_delta=0.0):
    _, counts, n_bins, k_bins = _linear_bin_info((64, 64), 1.0)
    counts = np.asarray(counts, float)
    pk = np.where(counts > 0, 100.0 * (1 + np.arange(float(n_bins))), np.nan)
    pdf = np.full(600, 1.0 / 6.0)
    common = {
        "timesteps": 1500, "scaling": "standard", "guide_w": 2.0,
        "checkpoint_fingerprint": "ckpt123", "k_bins": k_bins.tolist(),
        "pdf_bin_delta": 0.01,
    }

    def row(config, steps, pk_row, pdf_row, bpd, tp=244.0):
        return {"config": config, "steps": steps, "maps_per_min": tp,
                "pk": np.where(np.isfinite(pk_row), pk_row, None).tolist(),
                "pdf": pdf_row.tolist(), "bpd": float(bpd)}

    refs = dict(common)
    refs["n_eval_maps"] = 16384
    refs["pk_ddpm_ref"] = np.where(np.isfinite(pk), pk, None).tolist()
    refs["rows"] = [
        row("DDPM 1500 (reference math)", 1500, pk, pdf, 3.0),
        row("DDPM 1500, independent seed", 1500, pk * 1.002, pdf, 3.0),
        row("DDPM 1500, independent seed C", 1500, pk * 0.998, pdf, 3.0),
    ]
    val = dict(common)
    val["n_eval_maps"] = 65536
    val["rows"] = [
        row("DDPM 1500 (reference math)", 1500, pk, pdf, 3.0),
        row("strided DDPM 500 + spectral calibration", 500,
            pk * (1 + val_offset_pct / 100.0), pdf + pdf_tv / (0.5 * 6.0),
            3.0 + bpd_delta, tp=maps_per_min),
    ]
    rp, vp = tmp_path / "refs.json", tmp_path / "val.json"
    rp.write_text(json.dumps(refs))
    vp.write_text(json.dumps(val))
    return rp, vp


def _run(rp, vp, out):
    return subprocess.run(
        [sys.executable, str(SCRIPT), str(rp), str(vp), "-o", str(out)],
        capture_output=True, text=True,
    )


def test_certifies_inside_literal_tolerance(tmp_path):
    rp, vp = _mk_jsons(tmp_path, val_offset_pct=0.5)
    out = tmp_path / "final.json"
    r = _run(rp, vp, out)
    assert r.returncode == 0, r.stderr
    got = json.loads(out.read_text())
    # mean(B,C) = pk exactly (1.002/0.998 average), so the 0.5% offset row
    # scores 0.5% vs meanBC and certifies under the literal gate
    row = got["rows"][0]
    assert row["max_err_vs_meanBC_pct"] == pytest.approx(0.5, abs=0.02)
    assert row["max_err_vs_B_pct"] == pytest.approx(0.3, abs=0.02)
    assert row["max_err_vs_C_pct"] == pytest.approx(0.7, abs=0.02)
    assert got["certified_literal_1pct"] == [
        "strided DDPM 500 + spectral calibration"
    ]
    assert got["certified_full_battery"] == [
        "strided DDPM 500 + spectral calibration"
    ]
    # floor bookkeeping: B vs C distance is 0.4%
    assert got["reference_pair_distances_max_mean_pct"]["B_vs_C"][0] == (
        pytest.approx(0.4, abs=0.02)
    )
    assert 0.0 <= row["zero_bias_p_value"] <= 1.0


def test_rejects_outside_literal_tolerance_and_slow_rows(tmp_path):
    rp, vp = _mk_jsons(tmp_path, val_offset_pct=1.4)
    out = tmp_path / "final.json"
    assert _run(rp, vp, out).returncode == 0
    got = json.loads(out.read_text())
    assert got["certified_literal_1pct"] == []
    # inside tolerance but too slow: rejected too
    rp, vp = _mk_jsons(tmp_path, val_offset_pct=0.5, maps_per_min=480.0)
    assert _run(rp, vp, out).returncode == 0
    got = json.loads(out.read_text())
    assert got["certified_literal_1pct"] == []


def test_battery_clause_gates_full_certification(tmp_path):
    rp, vp = _mk_jsons(tmp_path, val_offset_pct=0.5, pdf_tv=0.05)
    out = tmp_path / "final.json"
    assert _run(rp, vp, out).returncode == 0
    got = json.loads(out.read_text())
    assert got["certified_literal_1pct"] != []
    assert got["certified_full_battery"] == []


def test_requires_seed_c_row(tmp_path):
    rp, vp = _mk_jsons(tmp_path)
    refs = json.loads(rp.read_text())
    refs["rows"] = refs["rows"][:2]  # drop seed C
    rp.write_text(json.dumps(refs))
    r = _run(rp, vp, tmp_path / "final.json")
    assert r.returncode != 0
    assert "seed C" in r.stderr


def test_rejects_protocol_mismatch(tmp_path):
    rp, vp = _mk_jsons(tmp_path)
    val = json.loads(vp.read_text())
    val["checkpoint_fingerprint"] = "other"
    vp.write_text(json.dumps(val))
    r = _run(rp, vp, tmp_path / "final.json")
    assert r.returncode != 0


def test_preregistered_rule(tmp_path):
    """The committed miss-handling decision (module docstring of the
    scorer, committed BEFORE any n16k_final.json existed): a literal miss
    still confirms iff the conservative zero-bias p-value >= 0.05; the
    throughput gate applies to both; no other escape hatch."""
    out = tmp_path / "final.json"
    cfg = "strided DDPM 500 + spectral calibration"

    # literal pass -> confirmed
    rp, vp = _mk_jsons(tmp_path, val_offset_pct=0.5)
    assert _run(rp, vp, out).returncode == 0
    got = json.loads(out.read_text())
    assert "preregistered_rule" in got
    assert got["confirmed_preregistered"] == [cfg]

    # literal miss, but consistent with a perfect sampler (p >= 0.05)
    # -> confirmed by the pre-registered rule
    rp, vp = _mk_jsons(tmp_path, val_offset_pct=1.1)
    assert _run(rp, vp, out).returncode == 0
    got = json.loads(out.read_text())
    row = got["rows"][0]
    assert not row["certified_literal_1pct"]
    assert row["zero_bias_p_value"] >= 0.05
    assert got["confirmed_preregistered"] == [cfg]

    # literal miss AND a perfect sampler would essentially never show it
    # (p < 0.05) -> a miss, reported as a miss
    rp, vp = _mk_jsons(tmp_path, val_offset_pct=2.0)
    assert _run(rp, vp, out).returncode == 0
    got = json.loads(out.read_text())
    assert got["rows"][0]["zero_bias_p_value"] < 0.05
    assert got["confirmed_preregistered"] == []

    # inside tolerance but too slow: the throughput gate blocks the
    # pre-registered decision too
    rp, vp = _mk_jsons(tmp_path, val_offset_pct=0.5, maps_per_min=480.0)
    assert _run(rp, vp, out).returncode == 0
    got = json.loads(out.read_text())
    assert got["confirmed_preregistered"] == []

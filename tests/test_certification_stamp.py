"""Checkpoint-fingerprint stamping of certification artifacts.

Round-3 failure mode: the committed calibration npz / stage-A/B jsons
outlived the checkpoint they were fitted to (lost to a /tmp wipe), and
bench.py kept quoting their certified rows.  Round 4 stamps the checkpoint
md5 into every artifact at creation time and verifies it at every consumer:

* fit_calibration.py refuses an unstamped sweep and stamps the npz;
* certify_fast_sampler --calibrated refuses a mismatched/unstamped npz
  (exercised end-to-end by the pipeline smoke; unit-covered via the meta
  loader here);
* bench.certified_serving_summary drops any validation json whose stamp
  does not match the committed checkpoint.
"""

import hashlib
import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_calibration_meta_roundtrip(tmp_path):
    from camels_diffusion_model_tpu.diffusion.calibration import (
        SpectralCalibration,
        load_calibration_meta,
    )

    calib = SpectralCalibration(coeffs=(0.0, 1.0), k_min=0.1, k_max=2.0)
    path = str(tmp_path / "c.npz")
    calib.save(path, meta={"checkpoint_fingerprint": "abc123",
                           "guide_w": 2.0, "deg": 6})
    meta = load_calibration_meta(path)
    assert meta["checkpoint_fingerprint"] == "abc123"
    assert float(meta["guide_w"]) == 2.0
    assert int(meta["deg"]) == 6
    # the filter itself round-trips unchanged
    back = SpectralCalibration.load(path)
    assert back.coeffs == calib.coeffs

    # legacy file (no meta) -> empty dict, load still works
    calib.save(str(tmp_path / "legacy.npz"))
    assert load_calibration_meta(str(tmp_path / "legacy.npz")) == {}


def _tiny_cert_json(tmp_path, with_fp=True):
    # fit_calibration weights by the REAL 64x64 linear-binning mode counts,
    # so the json must carry the real k grid.
    from camels_diffusion_model_tpu.ops.spectrum import power_spectrum_batch

    rs = np.random.RandomState(0)
    k, pk = power_spectrum_batch(rs.rand(4, 64, 64).astype(np.float32))
    k = np.asarray(k)
    pk_ref = np.asarray(pk).mean(axis=0)
    d = {
        "k_bins": [float(v) for v in k],
        "pk_ddpm_ref": [float(v) for v in pk_ref],
        "n_eval_maps": 64,
        "guide_w": 2.0,
        "timesteps": 100,
        "scaling": "standard",
        "rows": [
            {"config": "strided DDPM 10", "steps": 10,
             "pk": [float(v) for v in pk_ref * 1.05]},
        ],
    }
    if with_fp:
        d["checkpoint_fingerprint"] = "deadbeef"
    p = tmp_path / "cert.json"
    p.write_text(json.dumps(d))
    return str(p)


def test_fit_calibration_stamps_npz(tmp_path):
    from camels_diffusion_model_tpu.diffusion.calibration import (
        load_calibration_meta,
    )

    cert = _tiny_cert_json(tmp_path, with_fp=True)
    out = str(tmp_path / "calib.npz")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fit_calibration.py"),
         cert, "strided DDPM 10", "-o", out, "--deg", "2"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-800:]
    meta = load_calibration_meta(out)
    assert meta["checkpoint_fingerprint"] == "deadbeef"
    assert meta["fit_config"] == "strided DDPM 10"
    assert int(meta["timesteps"]) == 100


def test_fit_calibration_refuses_unstamped_sweep(tmp_path):
    cert = _tiny_cert_json(tmp_path, with_fp=False)
    out = str(tmp_path / "calib.npz")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fit_calibration.py"),
         cert, "strided DDPM 10", "-o", out],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert res.returncode != 0
    assert "checkpoint_fingerprint" in (res.stderr + res.stdout)
    assert not os.path.exists(out)


def _mk_validation_json(art, fp, certified=True):
    rows = [
        {"config": "DDPM 100 (reference math)", "steps": 100,
         "maps_per_min": 200.0, "max_err_vs_indep_pct": 0.0},
        {"config": "strided DDPM 10 + spectral calibration", "steps": 10,
         "maps_per_min": 900.0, "max_err_vs_indep_pct": 0.9},
    ]
    d = {
        "guide_w": 2.0,
        "checkpoint_fingerprint": fp,
        "noise_floor_max_pct_indep": 0.8,
        "rows": rows,
        "certified_configs_independent":
            [rows[1]["config"]] if certified else [],
        "certified_full_battery_independent":
            [rows[1]["config"]] if certified else [],
    }
    with open(os.path.join(art, "validation_w2_calibrated.indep.json"),
              "w") as f:
        json.dump(d, f)


def test_bench_summary_verifies_checkpoint_stamp(tmp_path, capsys):
    bench = _load_bench()
    art = str(tmp_path)
    os.makedirs(os.path.join(art, "model"))
    ckpt = os.path.join(art, "model", "train_state.msgpack")
    with open(ckpt, "wb") as f:
        f.write(b"fake checkpoint bytes")
    good_fp = hashlib.md5(b"fake checkpoint bytes").hexdigest()

    # matching stamp -> quoted, with the fingerprint echoed
    _mk_validation_json(art, good_fp)
    out = bench.certified_serving_summary(art_dir=art)
    assert len(out) == 1
    assert out[0]["maps_per_min"] == 900.0
    assert out[0]["checkpoint_fingerprint"] == good_fp
    assert out[0]["certified_full_battery"] is True

    # mismatched stamp -> dropped with a stderr warning
    _mk_validation_json(art, "0123456789abcdef0123456789abcdef")
    out = bench.certified_serving_summary(art_dir=art)
    assert out == []
    assert "does not match" in capsys.readouterr().err

    # missing stamp -> dropped too
    _mk_validation_json(art, None)
    assert bench.certified_serving_summary(art_dir=art) == []

    # no committed checkpoint at all -> nothing can verify -> dropped
    _mk_validation_json(art, good_fp)
    os.remove(ckpt)
    assert bench.certified_serving_summary(art_dir=art) == []


def _mk_confirmation_json(art, fp, max_err=0.93):
    # score_n16k_final.py output (the four-phase protocol's final artifact)
    d = {
        "guide_w": 2.0,
        "checkpoint_fingerprint": fp,
        "n_eval_refs": 16384,
        "n_eval_validation": 65536,
        "reference_pair_distances_max_mean_pct": {
            "A_vs_B": [0.99, 0.24], "A_vs_C": [0.9, 0.2],
            "B_vs_C": [0.8, 0.22],
        },
        "rows": [
            {"config": "strided DDPM 10 + spectral calibration", "steps": 10,
             "maps_per_min": 900.0, "max_err_vs_meanBC_pct": max_err,
             "mean_err_vs_meanBC_pct": 0.3, "zero_bias_p_value": 0.4,
             "certified_literal_1pct": max_err <= 1.0,
             "certified_full_battery": max_err <= 1.0},
        ],
        "certified_literal_1pct": (
            ["strided DDPM 10 + spectral calibration"] if max_err <= 1.0
            else []
        ),
    }
    os.makedirs(os.path.join(art, "n16k", "w2"), exist_ok=True)
    with open(os.path.join(art, "n16k", "w2", "n16k_final.json"), "w") as f:
        json.dump(d, f)


def test_bench_summary_quotes_n16k_confirmation(tmp_path, capsys):
    bench = _load_bench()
    art = str(tmp_path)
    os.makedirs(os.path.join(art, "model"))
    with open(os.path.join(art, "model", "train_state.msgpack"), "wb") as f:
        f.write(b"fake checkpoint bytes")
    good_fp = hashlib.md5(b"fake checkpoint bytes").hexdigest()
    _mk_validation_json(art, good_fp)

    # no confirmation artifact -> summary has no n16384 block
    out = bench.certified_serving_summary(art_dir=art)
    assert "n16384_confirmation" not in out[0]

    # matching-stamp confirmation -> quoted, literal clause resolved
    _mk_confirmation_json(art, good_fp, max_err=0.93)
    out = bench.certified_serving_summary(art_dir=art)
    conf = out[0]["n16384_confirmation"]
    assert conf["eval_maps_refs"] == 16384
    assert conf["eval_maps_validation"] == 65536
    assert conf["maps_per_min"] == 900.0
    assert conf["within_1pct_literal"] is True
    assert conf["zero_bias_p_value"] == 0.4
    assert conf["config"] == "strided DDPM 10 + spectral calibration"

    # a miss is reported honestly, not dropped
    _mk_confirmation_json(art, good_fp, max_err=1.23)
    out = bench.certified_serving_summary(art_dir=art)
    assert out[0]["n16384_confirmation"]["within_1pct_literal"] is False

    # mismatched stamp -> the confirmation block is dropped with a warning,
    # the validation row itself survives
    _mk_confirmation_json(art, "0123456789abcdef0123456789abcdef")
    out = bench.certified_serving_summary(art_dir=art)
    assert len(out) == 1
    assert "n16384_confirmation" not in out[0]
    assert "n16k" in capsys.readouterr().err


def test_rescore_battery_fields_and_full_battery_gate():
    rescore = _load_script("rescore_validation").rescore
    k = [0.0, 1.0, 2.0, 3.0]
    pk_a = [1.0, 10.0, 10.0, 10.0]
    pk_b = [1.0, 10.05, 10.0, 10.0]
    pdf_a = [0.5, 0.5]
    pdf_b = [0.502, 0.498]  # TV = 0.5*0.004*delta
    delta = 1.0
    sweep = {
        "k_bins": k, "pk_ddpm_ref": pk_a, "timesteps": 100,
        "pdf_bin_delta": delta, "pdf_ddpm_ref": pdf_a,
        "bpd_ddpm_ref": 1.0e-5,
        "rows": [
            {"config": "DDPM 100 (reference math)", "steps": 100,
             "pk": pk_a, "pdf": pdf_a, "bpd": 1.0e-5},
            {"config": "DDPM 100, independent seed", "steps": 100,
             "pk": pk_b, "pdf": pdf_b, "bpd": 1.01e-5},
        ],
    }
    ok = {"config": "good", "steps": 10, "maps_per_min": 900.0,
          "max_err_vs_ddpm1500_pct": 0.0, "pk": pk_a,
          "pdf": pdf_a, "bpd": 1.005e-5}
    # spectrally fine but pixel-PDF way off (TV >> max(floor, 0.01))
    bad_pdf = {"config": "bad pdf", "steps": 10, "maps_per_min": 900.0,
               "max_err_vs_ddpm1500_pct": 0.0, "pk": pk_a,
               "pdf": [0.9, 0.1], "bpd": 1.005e-5}
    # spectrally fine but BPD far outside max(floor, 1%)
    bad_bpd = {"config": "bad bpd", "steps": 10, "maps_per_min": 900.0,
               "max_err_vs_ddpm1500_pct": 0.0, "pk": pk_a,
               "pdf": pdf_a, "bpd": 2.0e-5}
    out = rescore(sweep, {"timesteps": 100, "rows": [ok, bad_pdf, bad_bpd]})
    assert out["pdf_floor_tv_indep"] == pytest.approx(0.002)
    assert out["bpd_floor_abs_indep"] == pytest.approx(1e-7, rel=1e-3)
    r_ok = out["rows"][0]
    assert r_ok["pdf_tv_vs_indep"] == pytest.approx(0.002)
    assert r_ok["bpd_delta_vs_indep"] == pytest.approx(-5e-8, rel=1e-3)
    # all three clear the spectral clause...
    assert set(out["certified_configs_independent"]) == {
        "good", "bad pdf", "bad bpd"}
    # ...but only the battery-clean row clears the full battery
    assert out["certified_full_battery_independent"] == ["good"]

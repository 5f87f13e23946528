"""Certified-serving resolver + `sample_power_spectra.py --serving` wiring.

The resolver (camels_diffusion_model_tpu/serving.py) must auto-select the
committed certified row for a guidance setting with HARD fingerprint
verification — the same semantics as bench.certified_serving_summary — and
the CLI flag must reproduce that configuration end-to-end (reference
contract upgraded from code/sample_power_spectra.py:361-388's
zero-configuration inference entry point).
"""

import hashlib
import json
import os

import numpy as np
import pytest

from camels_diffusion_model_tpu.diffusion.calibration import (
    SpectralCalibration,
)
from camels_diffusion_model_tpu.serving import (
    ServingConfig,
    ServingConfigError,
    resolve_serving_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_sps():
    """Load the REPO's sample_power_spectra.py by explicit path.

    tests/test_reference_parity.py imports the reference's same-named module
    (its oracle), which would poison a plain ``import sample_power_spectra``
    through sys.modules when the full suite runs in one process."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "repo_sample_power_spectra",
        os.path.join(REPO, "sample_power_spectra.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _mock_art_dir(tmp_path, *, steps=5, w=0, stamp_ok=True, calib=True,
                  calib_stamp=None, model_bytes=b"fake checkpoint bytes"):
    art = tmp_path / "certification"
    (art / "model").mkdir(parents=True)
    (art / "model" / "train_state.msgpack").write_bytes(model_bytes)
    md5 = hashlib.md5(model_bytes).hexdigest()
    rows = [
        {"config": f"strided DDPM {steps} + spectral calibration",
         "steps": steps, "maps_per_min": 100.0,
         "max_err_vs_indep_pct": 1.2},
        # Faster but NOT independently certified — must never win.
        {"config": "strided DDPM 2 + spectral calibration", "steps": 2,
         "maps_per_min": 500.0, "max_err_vs_indep_pct": 9.9},
    ]
    doc = {
        "guide_w": float(w),
        "checkpoint_fingerprint": md5 if stamp_ok else "deadbeef",
        "rows": rows,
        "certified_configs_independent": [rows[0]["config"]],
    }
    (art / f"validation_w{w}_calibrated.indep.json").write_text(
        json.dumps(doc)
    )
    if calib:
        c = SpectralCalibration(coeffs=(1.0,), k_min=0.1, k_max=3.0)
        c.save(str(art / f"calib_w{w}_{steps}.npz"),
               meta={"checkpoint_fingerprint": calib_stamp or md5})
    return str(art), md5


def test_resolver_picks_certified_max_throughput(tmp_path):
    art, md5 = _mock_art_dir(tmp_path)
    cfg = resolve_serving_config(0, art_dir=art)
    # The 500-maps/min row is faster but uncertified: the certified one wins.
    assert cfg.steps == 5
    assert cfg.config == "strided DDPM 5 + spectral calibration"
    assert cfg.expected_maps_per_min == 100.0
    assert cfg.checkpoint_fingerprint == md5
    assert os.path.exists(cfg.calibration_path)
    assert os.path.exists(cfg.model_path)


def test_resolver_rejects_stale_artifact_fingerprint(tmp_path):
    art, _ = _mock_art_dir(tmp_path, stamp_ok=False)
    with pytest.raises(ServingConfigError, match="different model"):
        resolve_serving_config(0, art_dir=art)


def test_resolver_rejects_stale_calibration_stamp(tmp_path):
    art, _ = _mock_art_dir(tmp_path, calib_stamp="feedface")
    with pytest.raises(ServingConfigError, match="model-specific"):
        resolve_serving_config(0, art_dir=art)


def test_resolver_requires_calibration_sidecar(tmp_path):
    art, _ = _mock_art_dir(tmp_path, calib=False)
    with pytest.raises(ServingConfigError, match="calibration"):
        resolve_serving_config(0, art_dir=art)


def test_resolver_rejects_nonintegral_and_unknown_guidance(tmp_path):
    art, _ = _mock_art_dir(tmp_path)
    with pytest.raises(ServingConfigError, match="integer guidance"):
        resolve_serving_config(0.5, art_dir=art)
    with pytest.raises(ServingConfigError, match="no certification"):
        resolve_serving_config(1, art_dir=art)


def test_committed_artifacts_resolve():
    """The repo's own certified rows must resolve: w=0 strided-430 @1201.5,
    w=2 strided-500 @722 (SPEEDUP.md certified serving table)."""
    cfg0 = resolve_serving_config(0)
    assert cfg0.steps == 430
    assert cfg0.expected_maps_per_min == 1201.5
    cfg2 = resolve_serving_config(2)
    assert cfg2.steps == 500
    assert cfg2.expected_maps_per_min == 722.0
    for cfg in (cfg0, cfg2):
        assert os.path.exists(cfg.calibration_path)
        assert cfg.checkpoint_fingerprint == json.load(
            open(os.path.join(
                REPO, "artifacts", "certification",
                f"validation_w{int(cfg.guide_w)}_calibrated.indep.json"))
        )["checkpoint_fingerprint"]


def _fake_cfg(tmp_path, steps=3, w=2.0):
    art, md5 = _mock_art_dir(tmp_path, steps=steps, w=int(w))
    return ServingConfig(
        guide_w=w, steps=steps,
        model_path=os.path.join(art, "model", "train_state.msgpack"),
        calibration_path=os.path.join(art, f"calib_w{int(w)}_{steps}.npz"),
        config=f"strided DDPM {steps} + spectral calibration",
        expected_maps_per_min=100.0, max_err_vs_indep_pct=1.2,
        checkpoint_fingerprint=md5,
    )


def test_cli_serving_flag_wiring(tmp_path, monkeypatch):
    import camels_diffusion_model_tpu.serving as serving_mod

    sps = _load_sps()
    cfg = _fake_cfg(tmp_path)
    seen = {}

    def fake_resolve(w, art_dir=None):
        seen["w"] = w
        return cfg

    monkeypatch.setattr(serving_mod, "resolve_serving_config", fake_resolve)
    monkeypatch.setattr(
        sps, "generate_comparison_plot",
        lambda **kw: seen.update(kw),
    )
    sps.main(["--serving", "2"])
    assert seen["w"] == 2.0
    assert seen["model_path"] == cfg.model_path
    assert seen["serving_steps"] == cfg.steps
    assert seen["calibration_path"] == cfg.calibration_path
    assert seen["guide_w"] == 2.0
    # Omitted guidance value defaults to w=0; a following positional is
    # not swallowed as the guidance.
    seen.clear()
    sps.main(["--serving"])
    assert seen["w"] == 0.0


def test_cli_serving_rejects_foreign_model(tmp_path, monkeypatch):
    import camels_diffusion_model_tpu.serving as serving_mod

    sps = _load_sps()
    cfg = _fake_cfg(tmp_path)
    monkeypatch.setattr(
        serving_mod, "resolve_serving_config",
        lambda w, art_dir=None: cfg,
    )
    with pytest.raises(SystemExit, match="model-specific"):
        sps.main(["--serving", "2", "/some/other/model.msgpack"])


@pytest.mark.slow
def test_cli_serving_end_to_end(tmp_path, monkeypatch):
    """--serving drives the full inference path: certified checkpoint load,
    strided-DDPM sampling at the certified step count, spectral-calibration
    application, and the reference artifact contract."""
    import jax

    import camels_diffusion_model_tpu.serving as serving_mod
    from camels_diffusion_model_tpu.models import ContextUnet
    from camels_diffusion_model_tpu.training import save_model_weights

    sps = _load_sps()
    cfg = _fake_cfg(tmp_path, steps=3, w=0.0)
    # Replace the fake checkpoint bytes with a REAL serialized template of
    # the full-size model so load_model_weights round-trips.
    model = ContextUnet(in_channels=1, n_feat=128, n_cfeat=6, height=64,
                        levels=2)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    save_model_weights(variables, cfg.model_path)
    monkeypatch.setattr(
        serving_mod, "resolve_serving_config",
        lambda w, art_dir=None: cfg,
    )
    out_dir = str(tmp_path / "out")
    # The 2x5 example-maps figure (viz.py, sample_power_spectra.py:319-336
    # parity) indexes 5 maps.
    monkeypatch.setenv("CAMELS_SAMPLE_N_MAPS", "5")
    sps.main(["--serving", "0",
              cfg.model_path, "8", out_dir])
    for name in ("power_spectrum_comparison.png",
                 "example_maps_comparison.png",
                 "power_spectrum_results.npy"):
        assert os.path.exists(os.path.join(out_dir, name)), name
    res = np.load(os.path.join(out_dir, "power_spectrum_results.npy"),
                  allow_pickle=True).item()
    assert np.isfinite(res["hicdm_pk_mean"]).all()

#!/usr/bin/env python
"""Inference-only power-spectrum validation CLI.

Reference contract: code/sample_power_spectra.py:361-388 (configuration lived
in __main__ there; here the same defaults are overridable positionally:
``python sample_power_spectra.py [model_path] [timesteps] [output_dir]``).

``--serving [w]`` (default w=0) serves the CERTIFIED fast configuration for
guidance ``w`` instead: the committed certification checkpoint, the
certified strided-DDPM step count, and its matching spectral calibration are
auto-selected from artifacts/certification/ with hard fingerprint
verification (camels_diffusion_model_tpu/serving.py — same semantics as
bench.certified_serving_summary).  One flag reproduces the certified
1201.5 (w=0) / 722 (w=2) maps/min serving rows end-to-end.
"""

import os
import sys

from camels_diffusion_model_tpu.cli.sample import generate_comparison_plot


def main(argv=None):
    argv = list(argv) if argv is not None else sys.argv[1:]

    serving = None
    if "--serving" in argv:
        i = argv.index("--serving")
        argv.pop(i)
        w = 0.0
        if i < len(argv):
            try:
                w = float(argv[i])
                argv.pop(i)
            except ValueError:
                pass  # next token is a positional, not the guidance value
        from camels_diffusion_model_tpu.serving import resolve_serving_config

        serving = resolve_serving_config(w)
        print(
            f"Certified serving config (guide_w={w:g}): {serving.config} — "
            f"{serving.expected_maps_per_min} maps/min/chip certified at "
            f"{serving.max_err_vs_indep_pct}% max P(k) error "
            f"(checkpoint {serving.checkpoint_fingerprint[:8]}…)"
        )

    model_path = argv[0] if len(argv) > 0 else (
        serving.model_path if serving is not None else
        "outputs/paper_lr_1e-05_epochs_100_timesteps_1500_params_6/"
        "weights/model_epoch_100.msgpack"
    )
    if serving is not None and model_path != serving.model_path:
        raise SystemExit(
            f"--serving uses the committed certified checkpoint "
            f"({serving.model_path}); a different model_path "
            f"({model_path}) cannot be paired with the certified "
            "calibration (calibrations are model-specific — "
            "scripts/calibration_transfer_diff.py)"
        )
    timesteps = int(argv[1]) if len(argv) > 1 else 1500
    output_dir = argv[2] if len(argv) > 2 else "power_spectrum_comparison_output"

    # Example cosmological parameters for the subtitle (reference:361-377).
    selected_params_dict = {
        "Ωm": 0.21940,
        "σ8": 0.90020,
        "ASN1": 3.88523,
        "AAGN1": 0.29895,
        "ASN2": 1.61664,
        "AAGN2": 1.48968,
    }
    generate_comparison_plot(
        model_path=model_path,
        camels_data_path=os.environ.get(
            "CAMELS_MAPS_PATH", "../data/Maps_HI_IllustrisTNG_LH_z=0.00.npy"
        ),
        params_path=os.environ.get("CAMELS_PARAMS_PATH", "../data/params.npy"),
        output_dir=output_dir,
        selected_params_dict=selected_params_dict,
        n_maps=int(os.environ.get("CAMELS_SAMPLE_N_MAPS", "15")),
        timesteps=timesteps,
        serving_steps=serving.steps if serving is not None else None,
        calibration_path=(
            serving.calibration_path if serving is not None else None
        ),
        guide_w=serving.guide_w if serving is not None else 0.0,
    )


if __name__ == "__main__":
    main()

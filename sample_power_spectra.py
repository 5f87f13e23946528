#!/usr/bin/env python
"""Inference-only power-spectrum validation CLI.

Reference contract: code/sample_power_spectra.py:361-388 (configuration lived
in __main__ there; here the same defaults are overridable positionally:
``python sample_power_spectra.py [model_path] [timesteps] [output_dir]``).
"""

import os
import sys

from camels_diffusion_model_tpu.cli.sample import generate_comparison_plot


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    model_path = argv[0] if len(argv) > 0 else (
        "outputs/paper_lr_1e-05_epochs_100_timesteps_1500_params_6/"
        "weights/model_epoch_100.msgpack"
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
        n_maps=15,
        timesteps=timesteps,
    )


if __name__ == "__main__":
    main()

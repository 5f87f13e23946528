#!/usr/bin/env python
"""Hyperparameter sweep driver (reference: run_experiment.py:1-11).

Runs the nested lr x epochs x timesteps grid as sequential subprocess
launches of the canonical trainer.  On a multi-host TPU fleet, prefer
launching one grid point per slice via scripts/launch_tpu.sh.
"""

import itertools
import subprocess
import sys

learning_rates = [1e-5, 1e-4]
epochs = [100]
timesteps = [1500]
num_params = [6]

if __name__ == "__main__":
    for lr, ep, ts, npar in itertools.product(
        learning_rates, epochs, timesteps, num_params
    ):
        cmd = [sys.executable, "train_diffusion.py", str(lr), str(ep), str(ts), str(npar)]
        print("Running:", " ".join(cmd))
        subprocess.run(cmd, check=True)

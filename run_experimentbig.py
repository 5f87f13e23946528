#!/usr/bin/env python
"""Sweep driver for the "big" 128x128 variant (reference: run_experimentbig.py)."""

import itertools
import subprocess
import sys

learning_rates = [1e-5]
epochs = [100]
timesteps = [1500]

if __name__ == "__main__":
    for lr, ep, ts in itertools.product(learning_rates, epochs, timesteps):
        cmd = [sys.executable, "main.py", str(lr), str(ep), str(ts)]
        print("Running:", " ".join(cmd))
        subprocess.run(cmd, check=True)

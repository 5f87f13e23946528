#!/usr/bin/env python
"""param.txt -> params.npy converter (reference: code/txt-npy.py:1-11).

Usage: python scripts/txt_to_npy.py [param.txt] [params.npy]
Expects a whitespace-delimited table of shape (1000, 6).
"""

import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    src = argv[0] if len(argv) > 0 else "param.txt"
    dst = argv[1] if len(argv) > 1 else "params.npy"
    data = np.loadtxt(src)
    print(f"Loaded {src}: shape {data.shape}")
    np.save(dst, data)
    print(f"Saved {dst}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Multispectral RGB+NIR training CLI (reference
`mult-dwtgs/train_nir.py:32-151`) — alias for `train.py --method mult-dwtgs`."""

import sys

from train import main

if __name__ == "__main__":
    main(["--method", "mult-dwtgs"] + sys.argv[1:])

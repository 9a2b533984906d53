#!/usr/bin/env python
"""Top-level train entry point (mirrors the reference's `python train.py
--machine ws --config configs/....yml`)."""

from improving_segmentation_with_selfsupervised_depth_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()

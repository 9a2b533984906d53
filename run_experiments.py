#!/usr/bin/env python
"""Top-level experiment runner (`python run_experiments.py --exp 210 --machine ws`)."""

from improving_segmentation_with_selfsupervised_depth_tpu.cli.run_experiments_cli import main

if __name__ == "__main__":
    main()

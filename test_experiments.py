#!/usr/bin/env python
"""Top-level smoke-test runner (`python test_experiments.py [--synthetic]`)."""

from improving_segmentation_with_selfsupervised_depth_tpu.cli.test_experiments_cli import main

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Top-level inference entry point (`python inference.py --model DIR --data DIR`)."""

from improving_segmentation_with_selfsupervised_depth_tpu.cli.inference_cli import main

if __name__ == "__main__":
    main()

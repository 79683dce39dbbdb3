#!/usr/bin/env python3
"""Metric Video Depth Anything CLI — parity with metric_depth/run.py.

Thin wrapper over the unified CLI with --metric: the metric model pins
scale, shift = 1, 0 during window stitching
(metric_depth/video_depth_anything/video_depth.py:132). Also fixes the
reference's latent --save_exr crash (metric_depth/run.py:62 uses the flag
without defining it)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    sys.argv.insert(1, "--metric")
    import run
    run.main()

#!/usr/bin/env python
"""Foveated AMR per-step timing at 1080p (reference
fps_test_amr_1080p_foveated.py) — BASELINE config 4 workload."""

import fps_test_amr_foveated

if __name__ == "__main__":
    fps_test_amr_foveated.main()

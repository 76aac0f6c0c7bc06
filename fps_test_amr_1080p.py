#!/usr/bin/env python
"""AMR FPS at fixed 1080p (reference fps_test_amr_1080p.py)."""

import fps_test

if __name__ == "__main__":
    fps_test.main(amr_mode=True, ratios=[1.0])

#!/usr/bin/env python
"""AMR rasterizer FPS sweep (reference fps_test_amr.py): same protocol as
fps_test.py with the foveated-AMR renderer (tile=32^2)."""

import fps_test

if __name__ == "__main__":
    fps_test.main(amr_mode=True)

#!/usr/bin/env python
"""TPU-native counterpart of the reference's root preprocess.py:
Visual Genome JPEGs + region JSON → VG-regions.h5 + VG-regions-dicts.json.
"""
from imagecaptioning_tpu.data.preprocess_vg import main

if __name__ == "__main__":
    main()

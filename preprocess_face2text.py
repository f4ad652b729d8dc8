#!/usr/bin/env python
"""TPU-native counterpart of the reference's AlexCap/my_model_preprocess.py:
CelebA JPEGs + Face2Text caption JSONs + attribute CSV →
face2text-data.h5 + face2text-dicts.json.
"""
from imagecaptioning_tpu.data.preprocess_face2text import main

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""TPU-native counterpart of the reference's train_LSTMwAttention.py driver."""
import sys
from imagecaptioning_tpu.train.cli import main

MODEL_TYPE = {"LSTM": "lstm", "LSTMwAttention": "lstm_attention",
              "Transformer": "transformer", "ViTB": "vitb"}["LSTMwAttention"]

if __name__ == "__main__":
    main(MODEL_TYPE, sys.argv[1:])

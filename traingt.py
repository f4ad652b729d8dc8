#!/usr/bin/env python
"""TPU-native counterpart of the reference's traingt.py driver
(AlexGTModel: VGG16 → GT-box ROI pooling → LSTM/Transformer captioner).

Usage: python traingt.py [key=value ...]   e.g. use_lstm=true max_iters=1000
"""
import sys

from imagecaptioning_tpu.config.dense_configs import get_gt_config
from imagecaptioning_tpu.train.dense_driver import train_gt


def main(argv=None):
    cfg = get_gt_config()
    for arg in (argv if argv is not None else sys.argv[1:]):
        k, _, v = arg.partition("=")
        cur = getattr(cfg, k)
        if isinstance(cur, bool):
            v = v.lower() in ("1", "true", "yes", "on")
        elif isinstance(cur, int):
            v = int(v)
        elif isinstance(cur, float):
            v = float(v)
        cfg = cfg.replace(**{k: v})
    return train_gt(cfg)


if __name__ == "__main__":
    main()

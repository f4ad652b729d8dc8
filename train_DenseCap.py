#!/usr/bin/env python
"""TPU-native counterpart of the reference's DenseCap/train.py driver
(full RPN dense captioning: VGG16 trunk → RPN → sampled ROI pooling →
objectness/box-reg/caption heads). The committed reference driver is
broken (DenseCap/train.py:49 unpacks 5 values from a 4-tuple); this is
the repaired, batched, jitted loop.

Usage: python train_DenseCap.py [key=value ...]
"""
import sys

from imagecaptioning_tpu.config.dense_configs import get_densecap_config
from imagecaptioning_tpu.train.dense_driver import train_rpn


def main(argv=None):
    cfg = get_densecap_config()
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
    return train_rpn(cfg)


if __name__ == "__main__":
    main()

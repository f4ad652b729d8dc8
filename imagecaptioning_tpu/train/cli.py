"""Shared CLI for the root-level training drivers.

The reference drivers are bare scripts with hard-coded configs and no
argparse (`train_LSTM.py` etc.); we keep their defaults but add
`--key=value` overrides for every config field plus:
  --smoke        tiny run (few iters, synthetic data) for CI/dev
  --synthetic    force the synthetic dataset even if the h5 exists
  --synthetic-learnable   synthetic images whose captions DESCRIBE the
                 rendered content (val METEOR measures generalization)
"""

from __future__ import annotations

import argparse
import json
import sys

from imagecaptioning_tpu.config import apply_overrides, get_config
from imagecaptioning_tpu.utils.platform import honor_jax_platforms_env


def main(model_type: str, argv=None) -> dict:
    honor_jax_platforms_env()
    from imagecaptioning_tpu.train.driver import train

    parser = argparse.ArgumentParser(
        description=f"Train the {model_type} captioner (TPU-native)")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny synthetic smoke run")
    parser.add_argument("--synthetic", action="store_true",
                        help="use the synthetic dataset")
    parser.add_argument("--synthetic-learnable", action="store_true",
                        help="synthetic dataset with content-derived "
                             "captions (generalization is learnable)")
    parser.add_argument("--synthetic-images", type=int, default=None)
    parser.add_argument("--max-iter", type=int, default=None)
    parser.add_argument("--eval-every", type=int, default=None)
    parser.add_argument("--set", nargs="*", default=[],
                        metavar="KEY=VALUE", help="config field overrides")
    args = parser.parse_args(argv)

    cfg = get_config(model_type)
    overrides = dict(kv.split("=", 1) for kv in args.set)
    if args.synthetic or args.smoke or args.synthetic_learnable:
        overrides.setdefault("data_h5", "/nonexistent")
        overrides.setdefault("from_checkpoint", "false")
    if args.smoke:
        overrides.setdefault("batch_size", "4")
        overrides.setdefault("save_checkpoint_every", "16")
        overrides.setdefault("num_epochs", "2")
        overrides.setdefault("eval_val_batch_size", "4")
    cfg = apply_overrides(cfg, overrides)

    max_iter = args.max_iter or (8 if args.smoke else None)
    eval_every = args.eval_every or (4 if args.smoke else None)
    summary = train(cfg, max_iter_override=max_iter,
                    eval_every_override=eval_every,
                    synthetic_images=(args.synthetic_images
                                      or (32 if args.smoke else 64)),
                    synthetic_learnable=args.synthetic_learnable)
    printable = {k: v for k, v in summary.items()
                 if k not in ("state", "model", "loader")}
    print(json.dumps(printable, default=str))
    return summary


if __name__ == "__main__":
    main(sys.argv[1])

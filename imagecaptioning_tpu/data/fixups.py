"""Dataset/checkpoint fixup utilities — the tested equivalents of the
reference's one-off scratch `AlexCap/json_modify.py` (which is broken as
committed: it uses `torch` before importing it). Three behaviors are
worth keeping as real, reusable functions:

1. `strip_backbone_keys` — drop backbone entries from a checkpoint
   state-dict (reference json_modify.py:8-16 strips 'resnet_backbone').
2. `merge_duplicate_test_descriptions` — Face2Text test JSONs contain
   consecutive records for the same image; collapse them, keeping the
   longest description (reference json_modify.py:32-47).
3. `channel_mean_std` — per-channel dataset statistics over [0,1]
   floats: mean of per-image channel means, and mean of per-image
   channel stds (the reference averages per-image stds rather than
   pooling — json_modify.py:84-99; reproduced exactly).
"""

from __future__ import annotations

import numpy as np


def strip_backbone_keys(state_dict: dict, marker: str = "resnet_backbone"):
    """Return a copy of `state_dict` without keys containing `marker`."""
    return {k: v for k, v in state_dict.items() if marker not in k}


def merge_duplicate_test_descriptions(records: list[dict]) -> list[dict]:
    """Collapse consecutive records sharing a filename into one record
    whose 'description' is the single longest of the group's
    descriptions (wrapped in a one-element list, like the reference's
    output file my_clean_test_2.1.json)."""
    out: list[dict] = []
    for rec in records:
        desc = rec["description"]
        descs = [desc] if isinstance(desc, str) else list(desc)
        if out and out[-1]["filename"] == rec["filename"]:
            out[-1]["description"].extend(descs)
        else:
            merged = dict(rec)
            merged["description"] = descs
            out.append(merged)
    for rec in out:
        if len(rec["description"]) > 1:
            lengths = [len(s) for s in rec["description"]]
            rec["description"] = [
                rec["description"][lengths.index(max(lengths))]]
    return out


def channel_mean_std(images_u8: np.ndarray):
    """(N, H, W, 3) uint8 → (mean[3], std[3]) over [0,1] floats.

    Matches the reference's estimator: mean = average of per-image
    channel means; std = average of per-image channel stds (population,
    computed as sqrt(E[x²] − E[x]²) per image)."""
    x = np.asarray(images_u8, dtype=np.float64) / 255.0
    per_img_mean = x.mean(axis=(1, 2))                       # (N, 3)
    per_img_sq = (x ** 2).mean(axis=(1, 2))
    per_img_std = np.sqrt(np.maximum(per_img_sq - per_img_mean ** 2, 0))
    return per_img_mean.mean(axis=0), per_img_std.mean(axis=0)

"""Normalization statistics and depth bins (reference utils/constants.py)."""

import math

import numpy as np

IMAGENET_DATASET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DATASET_STD = (0.229, 0.224, 0.225)
OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)

# 512 log-spaced bins in [0.1, 180] plus a far bin at 260 m.
DEPTH_BINS = np.concatenate(
    [
        np.logspace(math.log10(0.1), math.log10(180.0), num=512),
        np.asarray([260.0]),
    ]
).astype(np.float32)

"""SA evaluated under the COCO dual inst/sem segmentation protocol on the
synthetic COCO-shaped dataset — drives the img_based test_seg path
(reference img_based/test_seg.py:45-89: metrics vs instance AND semantic
masks, overlap-pixel exclusion, COCO collater) with no data on disk.
Shares the model of sa_synthetic_params-res64.py so its checkpoint loads.

Drive:
    python scripts/test_seg.py --params configs/sa_synthetic_coco-res64.py \
        --weight checkpoint/sa_synthetic_params-res64/ckpt_last
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("sa_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    dataset = "synthetic_coco"
    val_samples = 64
    load_anno = True

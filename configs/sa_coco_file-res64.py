"""SA trained on a FORMAT-TRUE on-disk COCO-2017 tree (real JPEGs +
instances_*.json parsed by the zero-dep MiniCOCO reader) and evaluated
under the dual instance+semantic protocol — the file-backed version of
sa_synthetic_coco-res64.py, exercising polygon decode, crowd filtering,
the COCO collater, and epoch-keyed train augmentation end-to-end from
real files (reference img_based/datasets/coco.py:243-288 + test_seg.py).

Drive:
    python scripts/data_utils/gen_mini_seg_data.py --out data_local \
        --coco_train 256 --coco_val 48 --res 96
    python scripts/train.py --params configs/sa_coco_file-res64.py
    python scripts/test_seg.py --params configs/sa_coco_file-res64.py \
        --weight checkpoint/sa_coco_file-res64/ckpt_final
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("sa_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    dataset = "coco"
    data_root = "data_local/mini_coco"
    load_anno = True

    max_epochs = 100      # 16 steps/epoch at bs 16 -> 1600 steps
    eval_interval = 10
    save_interval = 25.0
    save_epoch_end = False
    print_iter = 32
    train_batch_size = 16
    val_batch_size = 16
    num_workers = 2

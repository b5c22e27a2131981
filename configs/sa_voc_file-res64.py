"""SA trained on a FORMAT-TRUE on-disk PASCAL-VOC-2012 tree (real JPEGs +
palettized "P"-mode mask PNGs with 255-void boundary rings, canonical
JPEGImages / ImageSets/Segmentation / SegmentationClass(Aug) /
SegmentationObject layout) — trainaug split for training, val split's
instance masks for the dual eval (reference img_based/datasets/voc.py +
test_seg.py).

Drive:
    python scripts/data_utils/gen_mini_seg_data.py --out data_local \
        --voc 128 --res 96
    python scripts/train.py --params configs/sa_voc_file-res64.py
    python scripts/test_seg.py --params configs/sa_voc_file-res64.py \
        --weight checkpoint/sa_voc_file-res64/ckpt_final
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("sa_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    dataset = "voc"
    data_root = "data_local/mini_voc"
    load_anno = True

    max_epochs = 200      # 6 steps/epoch at bs 16 -> 1200 steps
    eval_interval = 20
    save_interval = 50.0
    save_epoch_end = False
    print_iter = 30
    train_batch_size = 16
    val_batch_size = 16
    num_workers = 2

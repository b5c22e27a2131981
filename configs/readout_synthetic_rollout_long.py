"""VQA readout CONVERGENCE run on rolled-out slots (round-5: the last
link of the 8-step vp_vqa pipeline gets a multi-thousand-step curve,
matching the other families' soak evidence). 256-video val/test rollouts
so the accuracy sweep is measured on a meaningful sample count.

Chain (after the savi_ldm long3 soak):
    python scripts/extract_slots.py \
        --params configs/savi_ldm_synthetic_long3-res64.py \
        --weight checkpoint/savi_ldm_synthetic_long3-res64/ckpt_final \
        --save_path checkpoint/savi_ldm_synthetic_long3-res64/slots_synthetic_big.pkl \
        --bs 8 --seq_len 8 --set val_samples=256
    python scripts/rollout_physion_slots.py \
        --params configs/ldmslotformer_synthetic_long3-res64.py \
        --weight checkpoint/ldmslotformer_synthetic_long3-res64/ckpt_final \
        --save_path checkpoint/ldmslotformer_synthetic_long3-res64/rollout_slots_big.pkl \
        --obs_frames 4 \
        --set slots_root=checkpoint/savi_ldm_synthetic_long3-res64/slots_synthetic_big.pkl
    python scripts/train.py --params configs/readout_synthetic_rollout_long.py
    python scripts/test_physion_vqa.py \
        --params configs/readout_synthetic_rollout_long.py \
        --weight 'checkpoint/readout_synthetic_rollout_long/ckpt_*'

Reference protocol: vp_vqa/test_physion_vqa.py:93-127 (ckpt x threshold
sweep over readout accuracy).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("readout_synthetic_rollout_params")


class SlotAttentionParams(_base.SlotAttentionParams):
    max_epochs = 200      # 16 steps/epoch at bs 32 over 512 rollouts
    eval_interval = 10
    save_interval = 25.0
    save_epoch_end = False
    print_iter = 64
    rollout_root = ("checkpoint/ldmslotformer_synthetic_long3-res64/"
                    "rollout_slots_big.pkl")

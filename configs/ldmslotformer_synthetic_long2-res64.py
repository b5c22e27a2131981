"""LDMSlotFormer chained off the 5.1k-step savi_ldm convergence run:
slots extracted from checkpoint/savi_ldm_synthetic_long2-res64 and its
dm_decoder grafted as the frozen LDM — the two-stage pipeline refreshed
on the strongest synthetic stage-1 model.

Drive order:
    python scripts/extract_slots.py \
        --params configs/savi_ldm_synthetic_long2-res64.py \
        --weight checkpoint/savi_ldm_synthetic_long2-res64/ckpt_final \
        --save_path checkpoint/savi_ldm_synthetic_long2-res64/slots_synthetic.pkl \
        --seq_len 8
    python scripts/train.py --params configs/ldmslotformer_synthetic_long2-res64.py
    python scripts/test_vp.py --params configs/ldmslotformer_synthetic_long2-res64.py \
        --weight checkpoint/ldmslotformer_synthetic_long2-res64/ckpt_last --bs 4 --max_batches 1
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("ldmslotformer_synthetic_params-res64")

_LONG2 = "checkpoint/savi_ldm_synthetic_long2-res64"


class SlotAttentionParams(_base.SlotAttentionParams):
    slots_root = f"{_LONG2}/slots_synthetic.pkl"
    dec_dict = dict(_base.SlotAttentionParams.dec_dict,
                    dm_ckp_path=f"{_LONG2}/ckpt_final")

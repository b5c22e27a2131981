"""LDMSlotFormer chained off the 20.5k-step savi_ldm soak run
(checkpoint/savi_ldm_synthetic_long3-res64): slots extracted from the
strongest synthetic stage-1 model, its dm_decoder grafted as the frozen
LDM decoder.

Drive order:
    python scripts/extract_slots.py \
        --params configs/savi_ldm_synthetic_long3-res64.py \
        --weight checkpoint/savi_ldm_synthetic_long3-res64/ckpt_final \
        --save_path checkpoint/savi_ldm_synthetic_long3-res64/slots_synthetic.pkl \
        --seq_len 8
    python scripts/train.py --params configs/ldmslotformer_synthetic_long3-res64.py
    python scripts/test_vp.py --params configs/ldmslotformer_synthetic_long3-res64.py \
        --weight checkpoint/ldmslotformer_synthetic_long3-res64/ckpt_last --bs 4 --max_batches 1
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("ldmslotformer_synthetic_long2-res64")

_LONG3 = "checkpoint/savi_ldm_synthetic_long3-res64"


class SlotAttentionParams(_base.SlotAttentionParams):
    slots_root = f"{_LONG3}/slots_synthetic.pkl"
    dec_dict = dict(_base.SlotAttentionParams.dec_dict,
                    dm_ckp_path=f"{_LONG3}/ckpt_final")

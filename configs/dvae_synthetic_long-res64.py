"""dVAE tokenizer long run on synthetic frames — stage 1 of the round-4
token-family soak (VERDICT r3 next-item 4): ~4k optimizer steps with the
gumbel tau cosine anneal active across the schedule, feeding the
checkpoint into configs/steve_synthetic_long-res64.py.

Drive:
    python scripts/train.py --params configs/dvae_synthetic_long-res64.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("dvae_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    max_epochs = 128
    train_samples = 512   # 32 steps/epoch at bs 16 -> 4096 steps total
    val_samples = 32
    eval_interval = 8
    save_interval = 16.0
    print_iter = 32

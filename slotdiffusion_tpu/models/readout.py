"""Physion VQA readout head.

Rebuild of vp_vqa/models/readout.py:11-109 (RelationNetwork-style): a linear
relation over every slot pair per timestep, symmetric aggregation
(sum/mean/max) over pairs, max over time, BCE-with-logits loss; eval sweeps
sigmoid thresholds (:89-101).
"""

from itertools import combinations
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class PhysionReadout(nn.Module):
    readout_dict: Dict
    dtype: Dtype = jnp.float32

    def setup(self):
        rd = self.readout_dict
        self.num_slots = rd["num_slots"]
        self.slot_size = rd["slot_size"]
        self.agg_func = rd.get("agg_func", "max")
        assert self.agg_func in ("sum", "mean", "max")
        feats_dim = rd.get("feats_dim", self.slot_size)
        combs = list(combinations(range(self.num_slots), 2))
        self.comb_idx = np.asarray(combs, np.int32)  # [num_combs, 2]
        self.linear1 = nn.Dense(feats_dim, dtype=self.dtype)
        self.linear2 = nn.Dense(1, dtype=jnp.float32)

    def __call__(self, data_dict, train=True):
        slots = data_dict["slots"]  # [B, T, N, C]
        B, T, N, C = slots.shape
        pairs = slots[:, :, self.comb_idx]  # [B, T, num_combs, 2, C]
        pairs = pairs.reshape(B, T, -1, 2 * C)
        relation = self.linear1(pairs)  # [B, T, num_combs, F]
        if self.agg_func == "sum":
            relation = relation.sum(2)
        elif self.agg_func == "mean":
            relation = relation.mean(2)
        else:
            relation = relation.max(2)
        logits = self.linear2(relation)[..., 0]  # [B, T]
        return {"logits": logits.max(1)}  # [B]

    def compute_losses(self, data_dict, sched=None, train=True):
        out = self(data_dict, train=train)
        logits = out["logits"].astype(jnp.float32)
        gt = data_dict["label"].reshape(-1).astype(jnp.float32)
        # BCE with logits
        vqa_loss = jnp.mean(
            jnp.maximum(logits, 0) - logits * gt +
            jnp.log1p(jnp.exp(-jnp.abs(logits))))
        losses = {"vqa_loss": vqa_loss}
        if not train:
            probs = jax.nn.sigmoid(logits)
            for thresh in np.arange(0.1, 1, 0.2):
                acc = jnp.mean(((probs > thresh) == (gt > 0.5))
                               .astype(jnp.float32))
                losses[f"acc_{thresh:.2f}"] = acc
        return out, losses

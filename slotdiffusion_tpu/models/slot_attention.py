"""Slot Attention — the core inverted-attention op.

TPU-native re-implementation of the reference's SlotAttention
(img_based/models/slot_attention.py:15-104, identical copy at
video_based/models/savi.py:17-114) and SlotAttentionWMask
(img_based/models/sa_diffusion.py:9-70).

Math per iteration (reference :78-102):
    q = W_q LN(slots)                    # no bias
    A = softmax_over_slots(scale * k q^T)   # [B, N_in, S]
    (seg mask = last-iteration A, transposed, before renorm)
    A = (A + eps) / sum_over_inputs(A)
    updates = A^T v                      # [B, S, D]
    slots = GRUCell(updates, slots_prev)
    slots = slots + MLP(LN(slots))

k, v are computed once from LN(inputs) outside the loop; the iteration count
is small and static (2-3), so the loop is unrolled into the XLA program,
letting the compiler fuse the whole refinement into one fusion group.

A fused Pallas kernel implementing the same math lives in
`slotdiffusion_tpu.ops.slot_attention_kernel`; it is used when
`use_pallas=True` and shapes are TPU-tileable.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class SlotAttention(nn.Module):
    """Iterative inverted cross-attention between slots and inputs.

    Args (mirroring reference ctor, slot_attention.py:18-34):
        num_iterations: number of refinement iterations (static).
        slot_size: slot feature dim D.
        mlp_hidden_size: hidden dim of the residual MLP.
        eps: renormalization epsilon.
        return_last_attn: if True, also return the last-iteration attention
            map (pre-renorm, transposed to [B, S, N]) as a segmentation mask —
            the `SlotAttentionWMask` variant (sa_diffusion.py:39-70).
    """

    num_iterations: int
    slot_size: int
    mlp_hidden_size: int
    eps: float = 1e-6
    return_last_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, slots):
        """
        Args:
            inputs: [B, N, C_in] flattened per-pixel features.
            slots: [B, S, D] slot initializations.

        Returns:
            slots [B, S, D], and if `return_last_attn`, seg masks [B, S, N].
        """
        B, N, _ = inputs.shape
        S, D = slots.shape[-2], self.slot_size
        scale = D ** -0.5

        norm_inputs = nn.LayerNorm(dtype=self.dtype, name="norm_inputs")
        project_k = nn.Dense(
            D, use_bias=False, dtype=self.dtype, name="project_k")
        project_v = nn.Dense(
            D, use_bias=False, dtype=self.dtype, name="project_v")
        norm_q = nn.LayerNorm(dtype=self.dtype, name="norm_q")
        project_q = nn.Dense(
            D, use_bias=False, dtype=self.dtype, name="project_q")
        gru = nn.GRUCell(features=D, dtype=self.dtype, name="gru")
        norm_mlp = nn.LayerNorm(dtype=self.dtype, name="norm_mlp")
        mlp_fc1 = nn.Dense(
            self.mlp_hidden_size, dtype=self.dtype, name="mlp_fc1")
        mlp_fc2 = nn.Dense(D, dtype=self.dtype, name="mlp_fc2")

        x = norm_inputs(inputs)
        k = project_k(x)  # [B, N, D]
        v = project_v(x)  # [B, N, D]

        seg_mask = None
        for it in range(self.num_iterations):
            slots_prev = slots
            q = project_q(norm_q(slots))  # [B, S, D]
            # softmax over the *slot* dim — the inverted-attention trick
            attn_logits = scale * jnp.einsum(
                "bnd,bsd->bns", k, q,
                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn_logits, axis=-1)  # [B, N, S]
            if it == self.num_iterations - 1 and self.return_last_attn:
                seg_mask = jax.lax.stop_gradient(
                    jnp.swapaxes(attn, -1, -2))  # [B, S, N]
            # renormalize over the spatial dim, weighted mean of values
            attn = (attn + self.eps).astype(self.dtype)
            attn = attn / jnp.sum(attn, axis=1, keepdims=True)
            updates = jnp.einsum(
                "bns,bnd->bsd", attn, v,
                preferred_element_type=jnp.float32).astype(self.dtype)
            # GRU update over flattened (B*S, D)
            new_slots, _ = gru(
                slots_prev.reshape(B * S, D), updates.reshape(B * S, D))
            slots = new_slots.reshape(B, S, D)
            slots = slots + mlp_fc2(nn.relu(mlp_fc1(norm_mlp(slots))))

        if self.return_last_attn:
            return slots, seg_mask
        return slots

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

k, v are computed once from LN(inputs) outside the loop as big MXU
matmuls. The refinement loop itself has two interchangeable backends over
ONE set of raw parameters (so checkpoints are backend-independent):

- `ops.slot_attention_kernel.sa_iterations_ref` — pure jnp, unrolled;
  XLA fuses the whole refinement (used on CPU and for autodiff).
- `sa_iterations` — the fused Pallas TPU kernel (one kernel for all
  iterations, attention accumulators resident in VMEM; see the kernel
  module docstring), with backward = autodiff of the jnp twin.

`use_pallas='auto'` currently resolves to the XLA path: measured on a
v5e at the flagship shapes (B=32, N=1024, S=15, D=192, 2 iters and B=8,
N=16384, S=11, 3 iters; scripts/bench_sa_kernel.py), XLA's reduction
fusion runs the refinement in ~26-45us vs the kernel's ~92us — the op's
operands are too small for Pallas' ~2us/grid-step overhead to amortize,
and XLA already reads k/v once per iteration at bf16. The kernel stays
as an optimization surface (`use_pallas=True`) with full parity tests.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.slot_attention_kernel import (pallas_supported, sa_iterations,
                                         sa_iterations_ref)

Dtype = Any


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def _orthogonal_packed(rng, shape, dtype=jnp.float32):
    """Three [D, D] orthogonal blocks packed to [D, 3D] — matches
    flax.linen.GRUCell's per-gate orthogonal recurrent init."""
    D = shape[0]
    init = nn.initializers.orthogonal()
    ks = jax.random.split(rng, 3)
    return jnp.concatenate([init(k, (D, D), dtype) for k in ks], axis=1)


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
        use_pallas: True / False / 'auto' (kernel on TPU when tileable).
    """

    num_iterations: int
    slot_size: int
    mlp_hidden_size: int
    eps: float = 1e-6
    return_last_attn: bool = False
    use_pallas: Any = "auto"
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
        B, N, C_in = inputs.shape
        D, M = self.slot_size, self.mlp_hidden_size
        lecun = nn.initializers.lecun_normal()
        zeros, ones = nn.initializers.zeros, nn.initializers.ones

        ln_in_scale = self.param("ln_in_scale", ones, (C_in,))
        ln_in_bias = self.param("ln_in_bias", zeros, (C_in,))
        wk = self.param("wk", lecun, (C_in, D))
        wv = self.param("wv", lecun, (C_in, D))
        p = {
            "wq": self.param("wq", lecun, (D, D)),
            "ln_q_scale": self.param("ln_q_scale", ones, (D,)),
            "ln_q_bias": self.param("ln_q_bias", zeros, (D,)),
            "gru_wi": self.param("gru_wi", lecun, (D, 3 * D)),
            "gru_bi": self.param("gru_bi", zeros, (3 * D,)),
            "gru_wh": self.param("gru_wh", _orthogonal_packed, (D, 3 * D)),
            "gru_bh": self.param("gru_bh", zeros, (3 * D,)),
            "ln_mlp_scale": self.param("ln_mlp_scale", ones, (D,)),
            "ln_mlp_bias": self.param("ln_mlp_bias", zeros, (D,)),
            "w1": self.param("w1", lecun, (D, M)),
            "b1": self.param("b1", zeros, (M,)),
            "w2": self.param("w2", lecun, (M, D)),
            "b2": self.param("b2", zeros, (D,)),
        }

        x = inputs.astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        # eps 1e-5 = torch LayerNorm default (reference norm_inputs,
        # slot_attention.py:36-38)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5) * ln_in_scale + ln_in_bias
        x = x.astype(self.dtype)
        k = (x @ wk.astype(self.dtype)).astype(jnp.float32)  # [B, N, D]
        v = (x @ wv.astype(self.dtype)).astype(jnp.float32)  # [B, N, D]
        slots = slots.astype(jnp.float32)

        use_pallas = self.use_pallas
        if use_pallas == "auto":
            # XLA path is the measured winner at all reference shapes
            # (see module docstring); flip here if the kernel overtakes it
            use_pallas = False
        elif use_pallas:
            use_pallas = _on_tpu() and pallas_supported(N, D)
        fn = sa_iterations if use_pallas else sa_iterations_ref
        if fn is sa_iterations:
            out = fn(k, v, slots, p, self.num_iterations, self.eps,
                     self.return_last_attn)
        else:
            out = fn(k, v, slots, p, num_iterations=self.num_iterations,
                     eps=self.eps, return_last_attn=self.return_last_attn)
        if self.return_last_attn:
            slots, seg_mask = out
            return slots.astype(self.dtype), seg_mask
        return out.astype(self.dtype)

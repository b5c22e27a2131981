"""Fused multi-head attention Pallas kernel for short token rows.

The UNet's attention operates on 16-256 tokens with head_dim 32
(reference unet/attention.py:157-251 at the flagship config's
num_head_channels=32). At these sizes the XLA lowering materializes the
f32 logits, the softmax intermediates and the per-head transposes in HBM
— measured at ~1.9ms of a 5.0ms denoise step (scripts/
bench_unet_breakdown.py, bench_unet_variants.py) against a ~0.7ms arithmetic
floor. This kernel keeps one batch-item's whole attention resident in
VMEM: one read of q/k/v, per-head matmul -> fast softmax -> value matmul
entirely on-chip, one write of the output. No transposes ever touch HBM —
heads are static lane slices of the packed [N, H*D] layout.

Training: `jax.custom_vjp` with the einsum reference replayed for the
backward (same cost the unfused path pays today; the forward speedup
applies to both training and sampling).

Status: measured-NEGATIVE in full-model context (round 4,
scripts/bench_unet_variants.py --variants fused_attention: 160.2 vs
~206 steps/s on the flagship UNet). XLA already fuses the logits ->
softmax -> value chain at these token counts, and this kernel's
one-batch-item-per-program grid serializes work XLA batches across the
MXU. Kept behind `attn_backend="fused"` as a parity-tested documented
dead end, like ops/winograd_conv.py and ops/fused_norm.py; "einsum"
remains the default.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-program VMEM budget (q/k/v/o blocks + f32 logits + temporaries)
_VMEM_LIMIT = 8 * 1024 * 1024


def mha_reference(q, k, v, num_heads, scale=None):
    """einsum reference: q [B, Nq, H*D], k/v [B, Nk, H*D] -> [B, Nq, H*D].

    fast-softmax variant (constant-shift identity; see
    models/unet._fast_softmax) computed in f32.
    """
    B, Nq, HD = q.shape
    Nk = k.shape[1]
    D = HD // num_heads
    scale = D ** -0.5 if scale is None else scale
    qh = q.reshape(B, Nq, num_heads, D)
    kh = k.reshape(B, Nk, num_heads, D)
    vh = v.reshape(B, Nk, num_heads, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    e = jnp.exp(jnp.minimum(logits, 80.0))
    w = (e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30)).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(B, Nq, HD)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, head_dim, scale,
                nk_valid):
    q = q_ref[0]  # [Nq, H*D]
    k = k_ref[0]  # [Nk_pad, H*D]
    v = v_ref[0]
    Nq = q.shape[0]
    Nk = k.shape[0]
    D = head_dim
    mask = None
    if nk_valid < Nk:  # cross-attention pad keys
        mask = jax.lax.broadcasted_iota(jnp.int32, (Nq, Nk), 1) < nk_valid
    outs = []
    for h in range(num_heads):
        qh = q[:, h * D:(h + 1) * D]
        kh = k[:, h * D:(h + 1) * D]
        vh = v[:, h * D:(h + 1) * D]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [Nq, Nk]
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        e = jnp.exp(jnp.minimum(logits, 80.0))
        w = (e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30)).astype(
            v.dtype)
        oh = jax.lax.dot_general(
            w, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Nq, D]
        outs.append(oh.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _sublane(dtype):
    return 16 if dtype == jnp.bfloat16 else 8


def fused_mha_supported(q_shape, k_shape, num_heads, dtype,
                        interpret=False):
    """Applicability: TPU (or interpret), packed lane-aligned head layout,
    sublane-aligned token rows, whole problem within the VMEM budget."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    if len(q_shape) != 3 or len(k_shape) != 3:
        return False
    B, Nq, HD = q_shape
    Nk = k_shape[1]
    if HD % num_heads or HD % 128:
        return False
    if Nq % _sublane(dtype):
        return False
    nk_pad = -(-Nk // _sublane(dtype)) * _sublane(dtype)
    esize = 2 if dtype == jnp.bfloat16 else 4
    vmem = (Nq + 2 * nk_pad) * HD * esize  # q + padded k/v
    vmem += Nq * HD * esize                # output
    vmem += Nq * nk_pad * 4 * 2            # logits f32 + exp temp
    return vmem * 2 <= _VMEM_LIMIT        # x2 for pipelining


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_mha(q, k, v, num_heads, scale=None, interpret=False):
    """Fused attention: q [B, Nq, H*D], k/v [B, Nk, H*D] -> [B, Nq, H*D].

    Falls back to the einsum reference when unsupported. fast-softmax
    numerics (identical to stable softmax for bounded logits).
    """
    D = q.shape[-1] // num_heads
    scale_v = D ** -0.5 if scale is None else scale
    if not fused_mha_supported(q.shape, k.shape, num_heads, q.dtype,
                               interpret):
        return mha_reference(q, k, v, num_heads, scale_v)
    B, Nq, HD = q.shape
    Nk = k.shape[1]
    sub = _sublane(q.dtype)
    nk_pad = -(-Nk // sub) * sub
    if nk_pad != Nk:
        pad = [(0, 0), (0, nk_pad - Nk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    kernel = functools.partial(
        _mha_kernel, num_heads=num_heads, head_dim=D, scale=scale_v,
        nk_valid=Nk)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, Nq, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Nq, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nq, HD), q.dtype),
    )(q, k, v)


def _fused_mha_fwd(q, k, v, num_heads, scale, interpret):
    out = fused_mha(q, k, v, num_heads, scale, interpret)
    return out, (q, k, v)


def _fused_mha_bwd(num_heads, scale, interpret, res, g):
    q, k, v = res
    D = q.shape[-1] // num_heads
    scale_v = D ** -0.5 if scale is None else scale
    _, vjp = jax.vjp(
        lambda q_, k_, v_: mha_reference(q_, k_, v_, num_heads, scale_v),
        q, k, v)
    return vjp(g)


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)

"""Fused Slot Attention iterations — Pallas TPU kernel + pure-jnp twin.

The reference's SlotAttention inner loop (img_based/models/slot_attention.py:
78-104) runs, per iteration: q-projection of LayerNorm'd slots, inverted
attention (softmax over the *slot* axis), spatial renormalization, weighted
mean of values, a GRUCell update, and a residual MLP. On GPU/torch each of
these is a separate kernel with the [B, N, S] attention map round-tripping
through HBM every iteration.

Here the whole refinement (all iterations) is ONE Pallas kernel:

- grid = (B, num_iterations, N // TN). Pallas pipelines the [TN, D] k/v
  tiles HBM->VMEM across grid steps (built-in double buffering); slots and
  the attention accumulators live in VMEM scratch that persists across the
  sequential TPU grid, so nothing but k/v tiles ever touches HBM inside the
  loop.
- layout: attention is computed as [S, TN] (slots on sublanes, space on
  lanes) so the inverted softmax is a sublane reduction and both matmuls
  (q @ k_tile^T and attn @ v_tile) hit the MXU with no transposes.
- the spatial renorm needs global sums over N; they are accumulated across
  N-tiles as num[s, d] = sum_n a[n, s] v[n, d] and den[s] = sum_n a[n, s],
  with the reference's +eps renorm folded in exactly:
      attn_norm = (a + eps) / sum_n (a + eps)
      updates   = (num + eps * vsum) / (den + N * eps),  vsum = sum_n v.
- the GRU cell (torch.nn.GRUCell parameterization — input and hidden
  biases on every gate, new-gate hidden term r-scaled; see the layout
  note above SA_WEIGHT_KEYS) and the residual MLP run in-kernel on the
  [S_pad, D] slots at the last N-tile of each iteration — a handful of
  tiny MXU matmuls.

Backward: `sa_iterations` is a jax.custom_vjp whose forward runs the Pallas
kernel and whose backward is XLA autodiff of the pure-jnp twin
`sa_iterations_ref` (flash-attention-style recompute; the twin is also the
CPU/fallback forward). Both paths share one weight-dict layout, so module
checkpoints are path-independent.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# weight-dict keys (all float32):
#   wq [D, D]            q projection (no bias)
#   ln_q_scale, ln_q_bias [D]
#   gru_wi [D, 3D]       input kernels, packed (r | z | n)
#   gru_bi [3D]          input biases,  packed (r | z | n)
#   gru_wh [D, 3D]       hidden kernels, packed (r | z | n)
#   gru_bh [3D]          hidden biases,  packed (r | z | n)
#   ln_mlp_scale, ln_mlp_bias [D]
#   w1 [D, M], b1 [M], w2 [M, D], b2 [D]
#
# GRU math (torch.nn.GRUCell parameterization — both input and hidden
# biases on every gate, new-gate hidden term r-scaled *including* its
# bias): this is a strict superset of flax.linen.GRUCell (which biases
# the inputs on all gates but the hidden only on n), so weights from
# either framework port exactly (flax: zero gru_bh[r|z] components).
SA_WEIGHT_KEYS = ("wq", "ln_q_scale", "ln_q_bias", "gru_wi", "gru_bi",
                  "gru_wh", "gru_bh", "ln_mlp_scale", "ln_mlp_bias",
                  "w1", "b1", "w2", "b2")

# torch nn.LayerNorm default eps — the reference builds its LNs with
# default eps (slot_attention.py:38,41,51), so parity requires 1e-5.
_LN_EPS = 1e-5


def _ln(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _gru(h, x, wi, bi, wh, bh):
    """torch.nn.GRUCell math (packed kernels, order r|z|n); see the
    weight-layout note above SA_WEIGHT_KEYS."""
    D = h.shape[-1]
    gi = x @ wi + bi               # [S, 3D]
    gh = h @ wh + bh               # [S, 3D]
    r = jax.nn.sigmoid(gi[..., :D] + gh[..., :D])
    z = jax.nn.sigmoid(gi[..., D:2 * D] + gh[..., D:2 * D])
    n = jnp.tanh(gi[..., 2 * D:] + r * gh[..., 2 * D:])
    return (1.0 - z) * n + z * h


def sa_iterations_ref(k, v, slots, p: Dict, *, num_iterations: int,
                      eps: float, return_last_attn: bool = False):
    """Pure-jnp twin of the fused kernel (also the backward-pass body).

    Args:
        k, v: [B, N, D] projected inputs.
        slots: [B, S, D] initial slots.
        p: weight dict, see SA_WEIGHT_KEYS.
    Returns:
        slots [B, S, D] (and last-iter attention [B, S, N] pre-renorm,
        stop-gradient'd, if return_last_attn).
    """
    D = slots.shape[-1]
    scale = D ** -0.5
    seg = None
    for it in range(num_iterations):
        q = _ln(slots, p["ln_q_scale"], p["ln_q_bias"]) @ p["wq"]
        logits = scale * jnp.einsum(
            "bnd,bsd->bns", k, q, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1)  # [B, N, S]
        if it == num_iterations - 1 and return_last_attn:
            seg = jax.lax.stop_gradient(jnp.swapaxes(attn, -1, -2))
        attn = attn + eps
        attn = attn / jnp.sum(attn, axis=1, keepdims=True)
        updates = jnp.einsum(
            "bns,bnd->bsd", attn, v, preferred_element_type=jnp.float32)
        new_slots = _gru(slots, updates, p["gru_wi"], p["gru_bi"],
                         p["gru_wh"], p["gru_bh"])
        slots = new_slots + (
            jax.nn.relu(_ln(new_slots, p["ln_mlp_scale"], p["ln_mlp_bias"])
                        @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"])
    if return_last_attn:
        return slots, seg
    return slots


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _sa_kernel(k_ref, v_ref, slots0_ref, wq_ref, lnq_ref, gwi_ref, gbi_ref,
               gwh_ref, gbh_ref, lnm_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               out_ref, mask_ref,
               slots_s, num_s, den_s, vsum_s,
               *, S, S_pad, D, N, TN, num_iterations, eps, scale,
               with_mask):
    it = pl.program_id(1)
    nt = pl.program_id(2)
    n_tiles = pl.num_programs(2)

    # ---- per-batch init: load slots, zero vsum --------------------------
    @pl.when(jnp.logical_and(it == 0, nt == 0))
    def _():
        slots_s[:, :] = slots0_ref[0]
        vsum_s[:, :] = jnp.zeros_like(vsum_s)

    # ---- iteration prologue (first tile): q projection ------------------
    @pl.when(nt == 0)
    def _():
        num_s[:, :] = jnp.zeros_like(num_s)
        den_s[:, :] = jnp.zeros_like(den_s)

    # q = LN(slots) @ Wq, masked so padded slot rows can't win the softmax.
    # Recomputed per tile (tiny: [S_pad, D] x [D, D]) to stay stateless.
    slots = slots_s[:, :]
    lnq = lnq_ref[:, :]  # [2, D] rows: scale, bias
    q = _ln(slots, lnq[0:1], lnq[1:2]) @ wq_ref[:, :]  # [S_pad, D]

    k_t = k_ref[0]  # [TN, D], f32 or bf16 (bf16 halves the HBM traffic,
    v_t = v_ref[0]  # matching XLA's default-TPU-precision matmuls)
    kv_dtype = k_t.dtype

    # inverted attention on the [S, TN] layout
    logits = scale * jax.lax.dot_general(
        q.astype(kv_dtype), k_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [S_pad, TN]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S_pad, TN), 0)
    logits = jnp.where(row_ids < S, logits, -1e30)
    a = jax.nn.softmax(logits, axis=0)  # softmax over slots

    if with_mask:
        @pl.when(it == num_iterations - 1)
        def _():
            mask_ref[0] = a.astype(mask_ref.dtype)

    num_s[:, :] += jax.lax.dot_general(
        a.astype(kv_dtype), v_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [S_pad, D]
    den_s[:, :1] += jnp.sum(a, axis=1, keepdims=True)

    @pl.when(it == 0)
    def _():
        vsum_s[:1, :] += jnp.sum(v_t, axis=0, keepdims=True,
                                 dtype=jnp.float32)

    # ---- iteration epilogue (last tile): renorm + GRU + MLP -------------
    @pl.when(nt == n_tiles - 1)
    def _():
        updates = (num_s[:, :] + eps * vsum_s[:1, :]) / \
            (den_s[:, :1] + N * eps)  # [S_pad, D]
        new_slots = _gru(slots, updates, gwi_ref[:, :], gbi_ref[:, :],
                         gwh_ref[:, :], gbh_ref[:, :])
        lnm = lnm_ref[:, :]
        h = jax.nn.relu(
            _ln(new_slots, lnm[0:1], lnm[1:2]) @ w1_ref[:, :] +
            b1_ref[:, :])
        new_slots = new_slots + (h @ w2_ref[:, :] + b2_ref[:, :])
        slots_s[:, :] = new_slots
        out_ref[0] = new_slots.astype(out_ref.dtype)


def _sa_kernel_resident(k_ref, v_ref, slots0_ref, wq_ref, lnq_ref, gwi_ref,
                        gbi_ref, gwh_ref, gbh_ref, lnm_ref, w1_ref, b1_ref,
                        w2_ref, b2_ref, out_ref, mask_ref,
                        *, S, S_pad, D, N, G, num_iterations, eps, scale,
                        with_mask):
    """Small-N variant: the whole [N, D] k/v for G batch items is VMEM
    resident, so all iterations run in one grid step with a single HBM
    read of k/v — the bandwidth-optimal schedule (the tiled variant
    re-reads k/v once per iteration). G items per grid step amortize the
    per-step pipeline overhead (~2-3us) that dominates at these sizes."""
    lnq = lnq_ref[:, :]
    lnm = lnm_ref[:, :]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S_pad, N), 0)

    for g in range(G):
        k = k_ref[g]
        v = v_ref[g]
        kv_dtype = k.dtype
        slots = slots0_ref[g]
        vsum = jnp.sum(v, axis=0, keepdims=True,
                       dtype=jnp.float32)  # [1, D]

        for it in range(num_iterations):
            q = _ln(slots, lnq[0:1], lnq[1:2]) @ wq_ref[:, :]  # [S_pad, D]
            logits = scale * jax.lax.dot_general(
                q.astype(kv_dtype), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [S_pad, N]
            logits = jnp.where(row_ids < S, logits, -1e30)
            a = jax.nn.softmax(logits, axis=0)
            if with_mask and it == num_iterations - 1:
                mask_ref[g] = a.astype(mask_ref.dtype)
            num = jax.lax.dot_general(
                a.astype(kv_dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [S_pad, D]
            den = jnp.sum(a, axis=1, keepdims=True)  # [S_pad, 1]
            updates = (num + eps * vsum) / (den + N * eps)
            new_slots = _gru(slots, updates, gwi_ref[:, :], gbi_ref[:, :],
                             gwh_ref[:, :], gbh_ref[:, :])
            h = jax.nn.relu(
                _ln(new_slots, lnm[0:1], lnm[1:2]) @ w1_ref[:, :] +
                b1_ref[:, :])
            slots = new_slots + (h @ w2_ref[:, :] + b2_ref[:, :])

        out_ref[g] = slots.astype(out_ref.dtype)


# whole-k/v-resident threshold: k+v blocks, double-buffered, must leave
# room for weights + logits in ~16 MB VMEM
_RESIDENT_BYTES = 4 * 1024 * 1024


def _choose_tile(N):
    for tn in (2048, 1024, 512, 256, 128):
        if N % tn == 0:
            return tn
    return None


def pallas_supported(N, D):
    return _choose_tile(N) is not None


def _pallas_resident(k, v, slots0, p, *, B, N, S, S_pad, D, M, scale,
                     num_iterations, eps, return_last_attn, interpret):
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    kv_bytes = k.dtype.itemsize
    # items per grid step: k+v for G items must fit the resident budget
    per_item = 2 * N * D * kv_bytes
    G = max(1, min(8, _RESIDENT_BYTES // per_item))
    while B % G:
        G -= 1
    lnq = jnp.stack([f32(p["ln_q_scale"]), f32(p["ln_q_bias"])])
    lnm = jnp.stack([f32(p["ln_mlp_scale"]), f32(p["ln_mlp_bias"])])
    full = lambda *shp: pl.BlockSpec(
        shp, lambda b: (0,) * len(shp), memory_space=pltpu.VMEM)
    per_b = lambda *shp: pl.BlockSpec(
        (G,) + shp, lambda b: (b,) + (0,) * len(shp),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _sa_kernel_resident, S=S, S_pad=S_pad, D=D, N=N, G=G,
        num_iterations=num_iterations, eps=eps, scale=scale,
        with_mask=return_last_attn)

    flops_mm = 2 * B * num_iterations * (N * S_pad * D * 2 + S_pad * D * (
        D + 6 * D + 2 * M))
    slots_out, mask = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            per_b(N, D), per_b(N, D), per_b(S_pad, D),
            full(D, D), full(2, D),
            full(D, 3 * D), full(1, 3 * D), full(D, 3 * D),
            full(1, 3 * D),
            full(2, D), full(D, M), full(1, M), full(M, D), full(1, D),
        ],
        out_specs=[per_b(S_pad, D), per_b(S_pad, N)],
        out_shape=[
            jax.ShapeDtypeStruct((B, S_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B, S_pad, N), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm,
            bytes_accessed=B * 2 * N * D * kv_bytes,
            transcendentals=B * num_iterations * N * S_pad),
        interpret=interpret,
    )(k, v, slots0, f32(p["wq"]), lnq, f32(p["gru_wi"]),
      f32(p["gru_bi"]).reshape(1, -1),
      f32(p["gru_wh"]), f32(p["gru_bh"]).reshape(1, -1), lnm,
      f32(p["w1"]), f32(p["b1"]).reshape(1, -1), f32(p["w2"]),
      f32(p["b2"]).reshape(1, -1))
    return slots_out, mask


def sa_iterations_pallas(k, v, slots, p: Dict, *, num_iterations: int,
                         eps: float, return_last_attn: bool = False,
                         interpret: bool = False, force_tiled: bool = False,
                         kv_dtype=jnp.bfloat16):
    """Pallas forward. Shapes: k, v [B, N, D]; slots [B, S, D].

    k/v are streamed through VMEM in `kv_dtype` (default bf16, matching
    XLA's default TPU matmul precision and halving the kernel's HBM
    traffic — it is bandwidth-bound). All accumulation stays f32."""
    B, N, D = k.shape
    S = slots.shape[1]
    S_pad = max(8, -(-S // 8) * 8)
    M = p["w1"].shape[1]
    scale = D ** -0.5
    k = jnp.asarray(k, kv_dtype)
    v = jnp.asarray(v, kv_dtype)
    if N * D * k.dtype.itemsize <= _RESIDENT_BYTES and not force_tiled:
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        slots0 = _pad_to(f32(slots), S_pad, axis=1)
        slots_out, mask = _pallas_resident(
            k, v, slots0, p, B=B, N=N, S=S, S_pad=S_pad, D=D, M=M,
            scale=scale, num_iterations=num_iterations, eps=eps,
            return_last_attn=return_last_attn, interpret=interpret)
        slots_out = slots_out[:, :S, :]
        if return_last_attn:
            return slots_out, jax.lax.stop_gradient(mask[:, :S, :])
        return slots_out
    TN = _choose_tile(N)
    assert TN is not None, f"N={N} not tileable"
    S_pad = max(8, -(-S // 8) * 8)
    M = p["w1"].shape[1]
    scale = D ** -0.5

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    slots0 = _pad_to(f32(slots), S_pad, axis=1)
    lnq = jnp.stack([f32(p["ln_q_scale"]), f32(p["ln_q_bias"])])   # [2, D]
    lnm = jnp.stack([f32(p["ln_mlp_scale"]), f32(p["ln_mlp_bias"])])

    grid = (B, num_iterations, N // TN)
    kv_spec = pl.BlockSpec((1, TN, D), lambda b, i, n: (b, n, 0),
                           memory_space=pltpu.VMEM)
    full = lambda *shp: pl.BlockSpec(
        shp, lambda b, i, n: (0,) * len(shp), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _sa_kernel, S=S, S_pad=S_pad, D=D, N=N, TN=TN,
        num_iterations=num_iterations, eps=eps, scale=scale,
        with_mask=return_last_attn)

    out_shape = [
        jax.ShapeDtypeStruct((B, S_pad, D), jnp.float32),
        jax.ShapeDtypeStruct((B, S_pad, N), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, S_pad, D), lambda b, i, n: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S_pad, TN), lambda b, i, n: (b, 0, n),
                     memory_space=pltpu.VMEM),
    ]

    flops_mm = 2 * B * num_iterations * (N * S_pad * D * 2 + S_pad * D * (
        D + 6 * D + 2 * M))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    slots_out, mask = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            kv_spec, kv_spec,
            pl.BlockSpec((1, S_pad, D), lambda b, i, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full(D, D), full(2, D),
            full(D, 3 * D), full(1, 3 * D), full(D, 3 * D),
            full(1, 3 * D),
            full(2, D), full(D, M), full(1, M), full(M, D), full(1, D),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((S_pad, D), jnp.float32),    # slots
            pltpu.VMEM((S_pad, D), jnp.float32),    # num accumulator
            pltpu.VMEM((S_pad, 128), jnp.float32),  # den accumulator
            pltpu.VMEM((8, D), jnp.float32),        # vsum
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm,
            bytes_accessed=B * num_iterations * 2 * N * D * k.dtype.itemsize,
            transcendentals=B * num_iterations * N * S_pad),
        interpret=interpret,
    )(k, v, slots0, f32(p["wq"]), lnq, f32(p["gru_wi"]),
      f32(p["gru_bi"]).reshape(1, -1),
      f32(p["gru_wh"]), f32(p["gru_bh"]).reshape(1, -1), lnm,
      f32(p["w1"]), f32(p["b1"]).reshape(1, -1), f32(p["w2"]),
      f32(p["b2"]).reshape(1, -1))

    slots_out = slots_out[:, :S, :]
    if return_last_attn:
        return slots_out, jax.lax.stop_gradient(mask[:, :S, :])
    return slots_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def sa_iterations(k, v, slots, p, num_iterations, eps,
                  return_last_attn=False):
    """Fused slot-attention refinement: Pallas forward (both when called
    directly — eval/inference — and as the primal of a differentiated
    call), backward = autodiff of the jnp twin. Callers gate on
    `pallas_supported` + TPU backend (models/slot_attention.py)."""
    return sa_iterations_pallas(
        k, v, slots, p, num_iterations=num_iterations, eps=eps,
        return_last_attn=return_last_attn)


def _sa_fwd(k, v, slots, p, num_iterations, eps, return_last_attn):
    out = sa_iterations_pallas(
        k, v, slots, p, num_iterations=num_iterations, eps=eps,
        return_last_attn=return_last_attn)
    return out, (k, v, slots, p)


def _sa_bwd(num_iterations, eps, return_last_attn, res, g):
    k, v, slots, p = res

    def f(k, v, slots, p):
        return sa_iterations_ref(
            k, v, slots, p, num_iterations=num_iterations, eps=eps,
            return_last_attn=return_last_attn)

    _, vjp = jax.vjp(f, k, v, slots, p)
    return vjp(g)


sa_iterations.defvjp(_sa_fwd, _sa_bwd)

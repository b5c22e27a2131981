"""Attention backend A/B at the UNet's hot shapes (single TPU chip).

The breakdown bench (bench_unet_breakdown.py) attributes ~2.1ms of the
5.28ms denoise step to the SpatialTransformer stack. This microbench
times one full transformer block (self-attn + slot cross-attn + GEGLU
FFN) at each attention resolution with different attention backends to
find the fusion-friendly formulation.

Usage: python scripts/bench_attention.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp

    B, SLOTS, SLOT_DIM = 32, 15, 192
    HEAD_DIM = 32

    def mha_einsum(q, k, v, num_heads, f32_softmax=True):
        Bq, Nq, HD = q.shape
        Nk = k.shape[1]
        D = HD // num_heads
        q = q.reshape(Bq, Nq, num_heads, D)
        k = k.reshape(Bq, Nk, num_heads, D)
        v = v.reshape(Bq, Nk, num_heads, D)
        scale = D ** -0.5
        pref = jnp.float32 if f32_softmax else jnp.bfloat16
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=pref) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16).reshape(Bq, Nq, HD)

    def mha_dpa(q, k, v, num_heads):
        Bq, Nq, HD = q.shape
        Nk = k.shape[1]
        D = HD // num_heads
        out = jax.nn.dot_product_attention(
            q.reshape(Bq, Nq, num_heads, D),
            k.reshape(Bq, Nk, num_heads, D),
            v.reshape(Bq, Nk, num_heads, D))
        return out.reshape(Bq, Nq, HD)

    def mha_flash(q, k, v, num_heads):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)
        Bq, Nq, HD = q.shape
        Nk = k.shape[1]
        D = HD // num_heads
        qh = q.reshape(Bq, Nq, num_heads, D).transpose(0, 2, 1, 3)
        kh = k.reshape(Bq, Nk, num_heads, D).transpose(0, 2, 1, 3)
        vh = v.reshape(Bq, Nk, num_heads, D).transpose(0, 2, 1, 3)
        blk = min(Nq, 512)
        sizes = BlockSizes(
            block_q=blk, block_k_major=min(Nk, 512), block_k=min(Nk, 512),
            block_b=1, block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_q_dkv=blk, block_k_dkv=blk, block_q_dq=blk,
            block_k_dq=blk, block_k_major_dq=blk)
        out = flash_attention(qh, kh, vh, causal=False,
                              sm_scale=D ** -0.5, block_sizes=sizes)
        return out.transpose(0, 2, 1, 3).reshape(Bq, Nq, HD)

    def block(params, x, ctx, mha_self, mha_cross, num_heads):
        """Transformer block matmuls with given attention backends; params
        are plain weight dicts so every variant shares weights."""
        def ln(x, s, b):
            xf = x.astype(jnp.float32)
            m = xf.mean(-1, keepdims=True)
            v = xf.var(-1, keepdims=True)
            return ((xf - m) * jax.lax.rsqrt(v + 1e-6) * s + b).astype(
                x.dtype)

        C = x.shape[-1]
        h = ln(x, params["s1"], params["b1"])
        q = h @ params["q1"]
        k = h @ params["k1"]
        v = h @ params["v1"]
        x = x + mha_self(q, k, v, num_heads) @ params["o1"]
        h = ln(x, params["s2"], params["b2"])
        q = h @ params["q2"]
        k = ctx @ params["k2"]
        v = ctx @ params["v2"]
        x = x + mha_cross(q, k, v, num_heads) @ params["o2"]
        h = ln(x, params["s3"], params["b3"])
        h = h @ params["w1"]
        a, g = jnp.split(h, 2, axis=-1)
        h = (a * jax.nn.gelu(g)) @ params["w2"]
        return x + h

    def bench(fn, *args, iters=100, tries=4):
        jfn = jax.jit(functools.partial(_chain, fn))
        float(jfn(*args, 1))
        float(jfn(*args, iters + 1))
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            float(jfn(*args, iters + 1))
            t1 = time.perf_counter()
            t2 = time.perf_counter()
            float(jfn(*args, 1))
            t3 = time.perf_counter()
            ts.append(((t1 - t0) - (t3 - t2)) / iters)
        return min(ts)

    def _chain(fn, params, x, ctx, iters):
        def body(i, x):
            return fn(params, x, ctx).astype(x.dtype)

        import jax.lax as lax
        return lax.fori_loop(0, iters, body, x)[0, 0, 0]

    rng = jax.random.PRNGKey(0)
    for N, C in ((256, 256), (64, 384), (16, 512)):
        heads = C // HEAD_DIM
        keys = jax.random.split(rng, 20)
        mk = lambda i, shape: (jax.random.normal(keys[i], shape,
                                                 jnp.bfloat16) * 0.05)
        params = dict(
            s1=jnp.ones((C,)), b1=jnp.zeros((C,)),
            s2=jnp.ones((C,)), b2=jnp.zeros((C,)),
            s3=jnp.ones((C,)), b3=jnp.zeros((C,)),
            q1=mk(0, (C, C)), k1=mk(1, (C, C)), v1=mk(2, (C, C)),
            o1=mk(3, (C, C)),
            q2=mk(4, (C, C)), k2=mk(5, (SLOT_DIM, C)),
            v2=mk(6, (SLOT_DIM, C)), o2=mk(7, (C, C)),
            w1=mk(8, (C, 8 * C)), w2=mk(9, (4 * C, C)),
        )
        x = jax.random.normal(keys[10], (B, N, C), jnp.bfloat16)
        ctx = jax.random.normal(keys[11], (B, SLOTS, SLOT_DIM),
                                jnp.bfloat16)

        variants = {
            "einsum_f32": functools.partial(
                block, mha_self=mha_einsum, mha_cross=mha_einsum,
                num_heads=heads),
            "einsum_bf16": functools.partial(
                block,
                mha_self=functools.partial(mha_einsum, f32_softmax=False),
                mha_cross=functools.partial(mha_einsum, f32_softmax=False),
                num_heads=heads),
            "dpa": functools.partial(
                block, mha_self=mha_dpa, mha_cross=mha_dpa,
                num_heads=heads),
        }
        if N >= 128:
            variants["flash_self"] = functools.partial(
                block, mha_self=mha_flash, mha_cross=mha_einsum,
                num_heads=heads)
        print(f"--- N={N} C={C} heads={heads} ---")
        for name, fn in variants.items():
            try:
                t = bench(fn, params, x, ctx)
                print(f"{name:<14} {t * 1e6:8.1f} us/block")
            except Exception as e:
                print(f"{name:<14} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

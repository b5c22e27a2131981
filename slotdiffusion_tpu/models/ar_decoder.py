"""Autoregressive token decoder for SLATE/STEVE.

TPU-native rebuild of the reference's GPT-style TransformerDecoder over dVAE
tokens (video_based/models/steve/steve_transformer.py:245-334 and the
identical img twin slate/slate_transformer.py): BOS token = vocab_size
(:296-298), causal self-attention (:165-167), slots as cross-attention
memory (:196-197), learned positional embedding, per-block output-projection
gain (3*num_blocks)^-0.5, greedy/sampled generation.

TPU re-design of `generate` (:308-334): the reference re-runs the full
forward per emitted token (O(n^2) full passes) on CPU-offloaded logits; here
generation is a single `lax.scan` with per-layer KV caches carried across
steps — each step does one token's worth of attention, and the whole loop
compiles into one XLA while program.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _head_split(x, num_heads):
    B, T, C = x.shape
    return x.reshape(B, T, num_heads, C // num_heads)


class ARMultiHeadAttention(nn.Module):
    """No-bias q/k/v/o attention with optional additive mask and the SLATE
    output-gain init (steve_transformer.py:12-56)."""

    d_model: int
    num_heads: int
    gain: float = 1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.d_model
        init = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
        out_init = nn.initializers.variance_scaling(
            self.gain ** 2, "fan_avg", "uniform")
        self.proj_q = nn.Dense(d, use_bias=False, kernel_init=init,
                               dtype=self.dtype)
        self.proj_k = nn.Dense(d, use_bias=False, kernel_init=init,
                               dtype=self.dtype)
        self.proj_v = nn.Dense(d, use_bias=False, kernel_init=init,
                               dtype=self.dtype)
        self.proj_o = nn.Dense(d, use_bias=False, kernel_init=out_init,
                               dtype=self.dtype)

    def _attend(self, q, k, v, mask=None):
        q = _head_split(q, self.num_heads)
        k = _head_split(k, self.num_heads)
        v = _head_split(v, self.num_heads)
        scale = (q.shape[-1]) ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, -jnp.inf, logits)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                         preferred_element_type=jnp.float32)
        B, T = out.shape[:2]
        return out.reshape(B, T, self.d_model).astype(self.dtype)

    def __call__(self, q_in, k_in, v_in, mask=None):
        q = self.proj_q(q_in)
        k = self.proj_k(k_in)
        v = self.proj_v(v_in)
        return self.proj_o(self._attend(q, k, v, mask))

    def project_kv(self, kv_in):
        return self.proj_k(kv_in), self.proj_v(kv_in)

    def step(self, q_in, k_cache, v_cache, valid_len):
        """Single-token decode against a KV cache.

        q_in: [B, 1, C]; k/v_cache: [B, L, C] (padded); valid_len: number of
        valid cache entries (the new token's k/v must already be written).
        """
        q = self.proj_q(q_in)
        L = k_cache.shape[1]
        pos = jnp.arange(L)[None, None, None, :]  # [1,1,1,L]
        mask = pos >= valid_len  # mask out unwritten slots
        return self.proj_o(self._attend(q, k_cache, v_cache, mask))


class ARDecoderBlock(nn.Module):
    """Pre-LN (post-LN on first block) causal self-attn -> cross-attn(slots)
    -> ReLU FFN (steve_transformer.py:146-202)."""

    d_model: int
    num_heads: int
    gain: float
    is_first: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.d_model
        self.self_attn_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.self_attn = ARMultiHeadAttention(
            d, self.num_heads, self.gain, dtype=self.dtype)
        self.cross_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.cross_attn = ARMultiHeadAttention(
            d, self.num_heads, self.gain, dtype=self.dtype)
        self.ffn_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        kaiming = nn.initializers.variance_scaling(2.0, "fan_in",
                                                   "truncated_normal")
        out_init = nn.initializers.variance_scaling(
            self.gain ** 2, "fan_avg", "uniform")
        self.ffn_fc1 = nn.Dense(4 * d, kernel_init=kaiming, dtype=self.dtype)
        self.ffn_fc2 = nn.Dense(d, kernel_init=out_init, dtype=self.dtype)

    def _ffn(self, x):
        return self.ffn_fc2(nn.relu(self.ffn_fc1(x)))

    def __call__(self, x, memory, causal_mask):
        if self.is_first:
            x = self.self_attn_ln(x)
            x = x + self.self_attn(x, x, x, causal_mask)
        else:
            h = self.self_attn_ln(x)
            x = x + self.self_attn(h, h, h, causal_mask)
        h = self.cross_ln(x)
        x = x + self.cross_attn(h, memory, memory)
        return x + self._ffn(self.ffn_ln(x))

    def step(self, x, memory_kv, k_cache, v_cache, pos):
        """One-token decode. Returns (out, new_k, new_v) where new_k/new_v
        are this token's self-attn K/V rows to store at `pos`."""
        if self.is_first:
            x = self.self_attn_ln(x)
            h = x
        else:
            h = self.self_attn_ln(x)
        new_k, new_v = self.self_attn.project_kv(h)
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, new_k, pos, 1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, new_v, pos, 1)
        x = x + self.self_attn.step(h, k_cache, v_cache, pos + 1)
        h = self.cross_ln(x)
        mk, mv = memory_kv
        x = x + self.cross_attn.proj_o(
            self.cross_attn._attend(self.cross_attn.proj_q(h), mk, mv))
        return x + self._ffn(self.ffn_ln(x)), k_cache, v_cache


class STEVETransformerDecoder(nn.Module):
    """AR token decoder; ctor args mirror steve_transformer.py:245-263."""

    vocab_size: int
    d_model: int
    n_head: int
    max_len: int
    num_slots: int
    num_layers: int
    dropout: float = 0.1  # kept for config parity; eval paths are dropless
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.d_model
        self.in_proj = nn.Dense(d, dtype=self.dtype)
        self.tok_emb = nn.Embed(self.vocab_size + 1, d,
                                embedding_init=nn.initializers.normal(0.02))
        self.pos_emb = self.param(
            "pos_emb", nn.initializers.truncated_normal(1.0),
            (1, self.max_len + 1, d))
        gain = (3 * max(self.num_layers, 1)) ** -0.5
        self.blocks = [
            ARDecoderBlock(
                d, self.n_head, gain, is_first=(i == 0), dtype=self.dtype,
                name=f"block{i}")
            for i in range(self.num_layers)
        ]
        self.final_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.head = nn.Dense(self.vocab_size, use_bias=False,
                             dtype=jnp.float32)

    def _embed(self, idx, offset=0):
        """Token + positional embedding, with BOS handled by the caller."""
        emb = self.tok_emb(idx)
        T = idx.shape[1]
        return emb + self.pos_emb[:, offset:offset + T].astype(emb.dtype)

    def __call__(self, slots, idx):
        """Teacher-forced forward (steve_transformer.py:283-306).

        Args:
            slots: [B, num_slots, C]
            idx: [B, T] input token ids (excludes the final GT token)

        Returns:
            logits [B, T+1, vocab_size] (BOS prepended).
        """
        B, T = idx.shape
        memory = self.in_proj(slots)
        bos = jnp.full((B, 1), self.vocab_size, idx.dtype)
        idx = jnp.concatenate([bos, idx], axis=1)
        x = self._embed(idx)
        L = T + 1
        causal = jnp.triu(jnp.ones((L, L), bool), k=1)[None, None]
        for blk in self.blocks:
            x = blk(x, memory, causal)
        return self.head(self.final_ln(x))

    def generate(self, slots, steps, sample=False, temperature=1.0,
                 rng=None):
        """KV-cached autoregressive generation as one lax.scan
        (TPU re-design of steve_transformer.py:308-334).

        Returns (token ids [B, steps], logits [B, steps, vocab]).
        """
        B = slots.shape[0]
        d = self.d_model
        memory = self.in_proj(slots)
        memory_kvs = [blk.cross_attn.project_kv(memory)
                      for blk in self.blocks]
        L = steps  # cache length: BOS + steps-1 generated tokens
        k_caches = jnp.zeros((self.num_layers, B, L, d), self.dtype)
        v_caches = jnp.zeros((self.num_layers, B, L, d), self.dtype)
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def step_fn(carry, pos):
            tok, k_caches, v_caches, rng = carry
            x = self.tok_emb(tok[:, None]) + jax.lax.dynamic_slice_in_dim(
                self.pos_emb, pos, 1, axis=1).astype(self.dtype)
            new_k, new_v = [], []
            for li, blk in enumerate(self.blocks):
                x, kc, vc = blk.step(
                    x, memory_kvs[li], k_caches[li], v_caches[li], pos)
                new_k.append(kc)
                new_v.append(vc)
            k_caches = jnp.stack(new_k)
            v_caches = jnp.stack(new_v)
            logits = self.head(self.final_ln(x))[:, 0]  # [B, vocab]
            rng, step_rng = jax.random.split(rng)
            if sample:
                nxt = jax.random.categorical(
                    step_rng, logits / temperature, axis=-1)
            else:
                nxt = jnp.argmax(logits, axis=-1)
            nxt = nxt.astype(jnp.int32)
            return (nxt, k_caches, v_caches, rng), (nxt, logits)

        bos = jnp.full((B,), self.vocab_size, jnp.int32)
        (_, _, _, _), (ids, logits) = jax.lax.scan(
            step_fn, (bos, k_caches, v_caches, rng), jnp.arange(steps))
        return ids.transpose(1, 0), logits.transpose(1, 0, 2)


# img twin (slate_transformer.py) — identical architecture
SLATETransformerDecoder = STEVETransformerDecoder

"""Slot transition predictors for SAVi/STEVE.

Rebuild of video_based/models/predictor.py: TransformerPredictor (:20-44),
ResidualMLPPredictor (:47-73), RNNPredictorWrapper (:76-135). The RNN
wrapper's hidden state is carried functionally through the SAVi `lax.scan`
instead of being module state.
"""

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class TransformerPredictor(nn.Module):
    """TransformerEncoder over the slot set (predictor.py:20-44); matches
    torch TransformerEncoderLayer semantics (pre/post-norm, ReLU FFN)."""

    d_model: int
    num_layers: int = 1
    num_heads: int = 4
    ffn_dim: int = 256
    norm_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, carry=None):
        for i in range(self.num_layers):
            if self.norm_first:
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
                h = nn.MultiHeadDotProductAttention(
                    num_heads=self.num_heads, dtype=self.dtype,
                    name=f"attn{i}")(h, h)
                x = x + h
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
                h = nn.Dense(self.ffn_dim, dtype=self.dtype)(h)
                h = nn.relu(h)
                h = nn.Dense(self.d_model, dtype=self.dtype)(h)
                x = x + h
            else:
                h = nn.MultiHeadDotProductAttention(
                    num_heads=self.num_heads, dtype=self.dtype,
                    name=f"attn{i}")(x, x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + h)
                h = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
                h = nn.relu(h)
                h = nn.Dense(self.d_model, dtype=self.dtype)(h)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + h)
        return x, carry


class ResidualMLPPredictor(nn.Module):
    """LN -> MLP with residual (predictor.py:47-73)."""

    channels: Sequence[int]
    norm_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, carry=None):
        res = None if self.norm_first else x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if self.norm_first:
            res = x
        chans = list(self.channels)
        for c in chans[1:-1]:
            x = nn.relu(nn.Dense(c, dtype=self.dtype)(x))
        x = nn.Dense(chans[-1], dtype=self.dtype)(x)
        return x + res, carry


class RNNPredictorWrapper(nn.Module):
    """base predictor -> LSTM over timesteps -> out projection
    (predictor.py:76-135). The LSTM carry is threaded explicitly: call with
    `carry=None` to start (zero state), pass the returned carry at the next
    frame. `sg_every` stop-gradients carry+input every k steps; the step
    counter lives in the carry."""

    base: nn.Module
    input_size: int
    hidden_size: int = 256
    num_layers: int = 1
    rnn_cell: str = "LSTM"
    sg_every: Optional[int] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.rnn_cell.upper() == "LSTM", "only LSTM is used upstream"
        self.cells = [
            nn.OptimizedLSTMCell(features=self.hidden_size, dtype=self.dtype,
                                 name=f"lstm{i}")
            for i in range(self.num_layers)
        ]
        self.out_proj = nn.Dense(self.input_size, dtype=self.dtype)

    def _zero_carry(self, batch_shape):
        zeros = lambda: jnp.zeros((*batch_shape, self.hidden_size),
                                  self.dtype)
        states = tuple((zeros(), zeros()) for _ in range(self.num_layers))
        return {"states": states, "step": jnp.zeros((), jnp.int32)}

    def __call__(self, x, carry=None):
        """x: [B, N, C] slots. Returns (pred, new_carry)."""
        B, N, C = x.shape
        if carry is None:
            carry = self._zero_carry((B * N,))
        states, step = carry["states"], carry["step"]
        if self.sg_every is not None:
            do_sg = jnp.logical_and(step % self.sg_every == 0, step > 0)
            sg = lambda a: jnp.where(do_sg, jax.lax.stop_gradient(a), a)
            x = sg(x)
            states = jax.tree_util.tree_map(sg, states)
        h = self.base(x)[0] if isinstance(self.base, (TransformerPredictor,
                                                      ResidualMLPPredictor)) \
            else self.base(x)
        h = h.reshape(B * N, C)
        new_states = []
        for cell, st in zip(self.cells, states):
            st, h = cell(st, h)
            new_states.append(st)
        out = self.out_proj(h).reshape(B, N, C)
        return out, {"states": tuple(new_states), "step": step + 1}


def build_predictor(pred_dict, slot_size, rnn_hidden_size=None,
                    dtype=jnp.float32):
    """Predictor dispatch mirroring SAVi._build_predictor usage
    (video_based/models/savi.py:320-347). `rnn_hidden_size` is the LSTM
    hidden width — the reference wires `slot_mlp_size` there
    (savi.py:340-343); slot_size*2 is only the default-config
    coincidence."""
    ptype = pred_dict.get("pred_type", "transformer")
    if ptype == "transformer":
        base = TransformerPredictor(
            d_model=slot_size,
            num_layers=pred_dict.get("pred_num_layers", 2),
            num_heads=pred_dict.get("pred_num_heads", 4),
            ffn_dim=pred_dict.get("pred_ffn_dim", slot_size * 4),
            norm_first=pred_dict.get("pred_norm_first", True),
            dtype=dtype)
    elif ptype == "mlp":
        base = ResidualMLPPredictor(
            channels=(slot_size, slot_size * 2, slot_size),
            norm_first=pred_dict.get("pred_norm_first", True),
            dtype=dtype)
    elif ptype in (None, "", "none"):
        return None
    else:
        raise ValueError(f"unknown predictor {ptype!r}")
    if pred_dict.get("pred_rnn", False):
        return RNNPredictorWrapper(
            base=base,
            input_size=slot_size,
            hidden_size=rnn_hidden_size or slot_size * 2,
            sg_every=pred_dict.get("pred_sg_every", None),
            dtype=dtype)
    return base

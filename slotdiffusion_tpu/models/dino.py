"""Frozen DINO ViT encoder.

Rebuild of the reference DINO wrapper (video_based/models/dino.py:10-73):
a frozen self-supervised ViT (facebook/dino-vits8/16, vitb8/16) whose patch
tokens (CLS stripped) are reshaped to a [B, H/p, W/p, C] feature map.

This environment has no network egress, so pretrained weights load from a
local path when available (`SLOTDIFFUSION_DINO_WEIGHTS` pointing at an .npz
of this module's param tree, or a HF directory convertible with
`convert_hf_dino_npz`). Without weights the encoder still runs (random init)
so the full SA-DINO pipeline is exercisable end-to-end.
"""

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

WEIGHTS_ENV = "SLOTDIFFUSION_DINO_WEIGHTS"


class ViTBlock(nn.Module):
    """LN eps 1e-6 throughout: the DINO ViT pins LayerNorm(eps=1e-6)
    (facebook DINO vision_transformer.py; preserved in the HF
    facebook/dino-vit* configs' layer_norm_eps)."""

    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype)(h)
        # exact erf gelu under f32 (torch/HF ViT default); tanh approx
        # under bf16 where its error is far below bf16 quantization and
        # erf lowers to a slow VPU polynomial (see unet.GEGLU)
        exact = jnp.dtype(self.dtype) == jnp.dtype(jnp.float32)
        h = nn.gelu(h, approximate=not exact)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class DINOEncoder(nn.Module):
    """ViT-S/B with patch size 8/16; returns patch-token feature map.

    Frozen at use sites via stop_gradient (reference keeps it eval-frozen,
    dino.py:56-60).
    """

    patch_size: int = 8
    small_size: bool = True  # ViT-S (384-d) vs ViT-B (768-d)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        # img: [B, H, W, 3]
        dim = 384 if self.small_size else 768
        heads = 6 if self.small_size else 12
        depth = 12
        B, H, W, _ = img.shape
        h, w = H // self.patch_size, W // self.patch_size
        x = nn.Conv(dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(img)
        x = x.reshape(B, h * w, dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h * w + 1, dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, dim)), x],
            axis=1) + pos.astype(self.dtype)
        for i in range(depth):
            x = ViTBlock(dim=dim, num_heads=heads, dtype=self.dtype,
                         name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        # strip CLS, back to a spatial map (reference dino.py:44-54)
        x = x[:, 1:].reshape(B, h, w, dim)
        return jax.lax.stop_gradient(x)


def convert_hf_dino_tree(state_dict, num_heads=6, depth=12):
    """HF `ViTModel` state dict -> NESTED flax `DINOEncoder` param tree
    (used by the full-model SA/SAVi converters for checkpoints whose
    encoder is a frozen DINO, torch_convert._sa_encoder_side)."""
    flat = convert_hf_dino_flat(state_dict, num_heads=num_heads,
                                depth=depth)
    tree = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def convert_hf_dino_npz(state_dict, out_path, num_heads=6, depth=12):
    """HF `ViTModel` state dict -> .npz of flattened param paths (the
    `load_dino_weights` format)."""
    out = convert_hf_dino_flat(state_dict, num_heads=num_heads, depth=depth)
    np.savez(out_path, **out)
    return out_path


def convert_hf_dino_flat(state_dict, num_heads=6, depth=12):
    """HF `ViTModel` (facebook/dino-vits8/16, vitb8/16) state dict ->
    {flattened/param/path: np.ndarray}.

    Accepts a torch state_dict or a {name: np.ndarray} dict. Layout:
    torch linear [out, in] -> flax kernel [in, out]; q/k/v reshaped to
    flax MultiHeadDotProductAttention's [in, heads, head_dim]."""
    sd = {}
    for k, v in state_dict.items():
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)

    dim = sd["embeddings.cls_token"].shape[-1]
    hd = dim // num_heads
    out = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed/kernel": np.transpose(
            sd["embeddings.patch_embeddings.projection.weight"],
            (2, 3, 1, 0)),
        "patch_embed/bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "LayerNorm_0/scale": sd["layernorm.weight"],
        "LayerNorm_0/bias": sd["layernorm.bias"],
    }
    for i in range(depth):
        p = f"encoder.layer.{i}"
        b = f"block{i}"
        out[f"{b}/LayerNorm_0/scale"] = sd[f"{p}.layernorm_before.weight"]
        out[f"{b}/LayerNorm_0/bias"] = sd[f"{p}.layernorm_before.bias"]
        out[f"{b}/LayerNorm_1/scale"] = sd[f"{p}.layernorm_after.weight"]
        out[f"{b}/LayerNorm_1/bias"] = sd[f"{p}.layernorm_after.bias"]
        for name in ("query", "key", "value"):
            w = sd[f"{p}.attention.attention.{name}.weight"]
            bias = sd[f"{p}.attention.attention.{name}.bias"]
            out[f"{b}/attn/{name}/kernel"] = np.transpose(w).reshape(
                dim, num_heads, hd)
            out[f"{b}/attn/{name}/bias"] = bias.reshape(num_heads, hd)
        wo = sd[f"{p}.attention.output.dense.weight"]
        out[f"{b}/attn/out/kernel"] = np.transpose(wo).reshape(
            num_heads, hd, dim)
        out[f"{b}/attn/out/bias"] = sd[f"{p}.attention.output.dense.bias"]
        out[f"{b}/Dense_0/kernel"] = np.transpose(
            sd[f"{p}.intermediate.dense.weight"])
        out[f"{b}/Dense_0/bias"] = sd[f"{p}.intermediate.dense.bias"]
        out[f"{b}/Dense_1/kernel"] = np.transpose(
            sd[f"{p}.output.dense.weight"])
        out[f"{b}/Dense_1/bias"] = sd[f"{p}.output.dense.bias"]
    return out


def load_dino_weights(params):
    """Overlay pretrained weights from SLOTDIFFUSION_DINO_WEIGHTS (.npz of
    flattened param paths) onto a param tree; returns params unchanged if
    unset/missing."""
    path = os.environ.get(WEIGHTS_ENV, "")
    if not os.path.isfile(path):
        return params, False
    data = np.load(path)
    flat = jax.tree_util.tree_flatten_with_path(params)
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for kpath, leaf in flat[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in kpath)
        leaves.append(jnp.asarray(data[key]) if key in data else leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves), True

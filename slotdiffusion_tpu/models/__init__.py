"""Model registry and `build_model` dispatch.

One unified registry replaces the reference's three per-task dispatchers
(img_based/models/__init__.py:12-38, video_based/models/__init__.py:12-33,
vp_vqa/models/__init__.py:9-22). Nested config dicts are passed verbatim
into model constructors, mirroring the reference contract.
"""

import jax.numpy as jnp

from .ar_decoder import SLATETransformerDecoder, STEVETransformerDecoder
from .diffusion import DDPM, LDM, CondDDPM
from .dino import DINOEncoder
from .dvae import DVAE
from .predictor import (ResidualMLPPredictor, RNNPredictorWrapper,
                        TransformerPredictor, build_predictor)
from .readout import PhysionReadout
from .resnet import ResNet, resnet18, resnet34
from .sa import SA, SAEncoder, SpatialBroadcastDecoder
from .savi import SAVi
from .slate import SLATE, STEVE
from .slot_attention import SlotAttention
from .slot_diffusion import SADiffusion, SAViDiffusion
from .slotformer import LDMSlotFormer, SlotFormer, SlotRollouter
from .vqvae import VQVAE, VectorQuantizer, VQVAEWrapper

__all__ = [
    "build_model", "SA", "SADiffusion", "SAVi", "SAViDiffusion", "SLATE",
    "STEVE", "SlotAttention", "VQVAE", "VQVAEWrapper", "VectorQuantizer",
    "DVAE", "DDPM", "CondDDPM", "LDM", "SlotFormer", "LDMSlotFormer",
    "SlotRollouter", "PhysionReadout", "DINOEncoder", "ResNet", "resnet18",
    "resnet34", "STEVETransformerDecoder", "SLATETransformerDecoder",
    "SAEncoder", "SpatialBroadcastDecoder", "TransformerPredictor",
    "ResidualMLPPredictor", "RNNPredictorWrapper", "build_predictor",
]


def _dtype_of(params):
    return jnp.bfloat16 if params.get("use_bf16", False) else jnp.float32


def build_model(params):
    """Instantiate the model named by `params.model` from nested config
    dicts; the per-model kwargs mirror the reference dispatchers."""
    name = params.model
    dtype = _dtype_of(params)
    resolution = tuple(params.resolution)

    if name == "SA":
        return SA(resolution=resolution, slot_dict=params.slot_dict,
                  enc_dict=params.enc_dict, dec_dict=params.dec_dict,
                  loss_dict=params.loss_dict, dtype=dtype)
    if name == "SADiffusion":
        return SADiffusion(
            resolution=resolution, slot_dict=params.slot_dict,
            enc_dict=params.enc_dict, dec_dict=params.dec_dict,
            loss_dict=params.loss_dict, dtype=dtype)
    if name == "SLATE":
        return SLATE(resolution=resolution, slot_dict=params.slot_dict,
                     enc_dict=params.enc_dict, dec_dict=params.dec_dict,
                     dvae_dict=params.dvae_dict, loss_dict=params.loss_dict,
                     dtype=dtype)
    if name == "SAVi":
        return SAVi(resolution=resolution, slot_dict=params.slot_dict,
                    enc_dict=params.enc_dict, dec_dict=params.dec_dict,
                    pred_dict=params.pred_dict, loss_dict=params.loss_dict,
                    clip_len=params.get("clip_len", params.get(
                        "n_sample_frames", 6)),
                    dtype=dtype)
    if name == "SAViDiffusion":
        return SAViDiffusion(
            resolution=resolution, slot_dict=params.slot_dict,
            enc_dict=params.enc_dict, dec_dict=params.dec_dict,
            pred_dict=params.pred_dict, loss_dict=params.loss_dict,
            clip_len=params.get("clip_len", params.get(
                "n_sample_frames", 6)),
            dtype=dtype)
    if name == "STEVE":
        return STEVE(resolution=resolution, slot_dict=params.slot_dict,
                     enc_dict=params.enc_dict, dec_dict=params.dec_dict,
                     dvae_dict=params.dvae_dict, pred_dict=params.pred_dict,
                     loss_dict=params.loss_dict,
                     clip_len=params.get("clip_len", params.get(
                         "n_sample_frames", 6)),
                     dtype=dtype)
    if name in ("VQVAE", "VQVAEModel"):
        return VQVAE(enc_dec_dict=params.enc_dec_dict,
                     vq_dict=params.vq_dict, dtype=dtype)
    if name in ("dVAE", "DVAE"):
        return DVAE(vocab_size=params.dvae_dict["vocab_size"]
                    if params.get("dvae_dict") else params.vocab_size,
                    dtype=dtype)
    if name == "SlotFormer":
        return SlotFormer(
            resolution=resolution, clip_len=params.get("clip_len", 6),
            slot_dict=params.slot_dict, dec_dict=params.dec_dict,
            rollout_dict=params.rollout_dict, loss_dict=params.loss_dict,
            dtype=dtype)
    if name == "LDMSlotFormer":
        return LDMSlotFormer(
            resolution=resolution, clip_len=params.get("clip_len", 6),
            slot_dict=params.slot_dict, dec_dict=params.dec_dict,
            rollout_dict=params.rollout_dict, loss_dict=params.loss_dict,
            dtype=dtype)
    if name == "PhysionReadout":
        return PhysionReadout(readout_dict=params.readout_dict, dtype=dtype)
    raise ValueError(f"unknown model {name!r}")

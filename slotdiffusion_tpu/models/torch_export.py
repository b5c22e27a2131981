"""Flax -> torch state-dict exporters: the inverse of `torch_convert`.

Checkpoint interop in the opposite direction: a model trained by this
framework on TPU can be exported to the reference's torch layout
(Wuziyi616/SlotDiffusion) and loaded with `module.load_state_dict(...)`
— so existing torch eval stacks and downstream tools keep working.

Every `export_torch_*` here mirrors the walk of the corresponding
`convert_torch_*` and is its exact inverse: transposes/reshapes are
lossless, so `convert(export(tree)) == tree` bit-for-bit (covered by
`tests/test_torch_export.py`, which also asserts the exported key set
equals exactly the keys the converter consumes — no silently-skipped
weights that would load-back as random init).

Output is a plain `{torch_param_name: np.ndarray}` dict; wrap values
with `torch.from_numpy` (or pass through `load_state_dict` after tensor
conversion) on the torch side. Frozen torch buffers that the flax side
recomputes (sine PEs, causal masks, pair-index tables) are NOT emitted
— load with `strict=False`; their values are input-independent
constants identical across both frameworks (parity-tested in
tests/test_reference_parity.py).

Layout rules (inverse of torch_convert.py:10-13):
    conv   [kh, kw, C, F] -> [F, C, kh, kw]   (transpose 3,2,0,1)
    linear [in, out]      -> [out, in]        (transpose)
    norm   scale/bias     -> weight/bias      (unchanged vectors)
"""

from typing import Dict, Sequence

import numpy as np


def _np(x):
    return np.asarray(x)


def _inv_conv(out, prefix, sub):
    out[f"{prefix}.weight"] = np.transpose(_np(sub["kernel"]), (3, 2, 0, 1))
    out[f"{prefix}.bias"] = _np(sub["bias"])


def _inv_convnb(out, prefix, sub):
    out[f"{prefix}.weight"] = np.transpose(_np(sub["kernel"]), (3, 2, 0, 1))


def _inv_linear(out, prefix, sub):
    out[f"{prefix}.weight"] = np.transpose(_np(sub["kernel"]))
    if "bias" in sub:
        out[f"{prefix}.bias"] = _np(sub["bias"])


def _inv_norm(out, prefix, sub):
    g = sub["GroupNorm_0"]
    out[f"{prefix}.weight"] = _np(g["scale"])
    out[f"{prefix}.bias"] = _np(g["bias"])


def _inv_layernorm(out, prefix, sub):
    out[f"{prefix}.weight"] = _np(sub["scale"])
    out[f"{prefix}.bias"] = _np(sub["bias"])


def _inv_resblock(out, p, sub):
    """Inverse of torch_convert._resblock (reference unet/unet.py:182-285)."""
    _inv_norm(out, f"{p}.in_layers.0", sub["GroupNorm32_0"])
    _inv_conv(out, f"{p}.in_layers.2", sub["Conv_0"])
    _inv_linear(out, f"{p}.emb_layers.1", sub["Dense_0"])
    _inv_norm(out, f"{p}.out_layers.0", sub["GroupNorm32_1"])
    _inv_conv(out, f"{p}.out_layers.3", sub["Conv_1"])
    if "Conv_2" in sub:
        _inv_conv(out, f"{p}.skip_connection", sub["Conv_2"])


def _inv_cross_attention(out, p, sub):
    _inv_linear(out, f"{p}.to_q", sub["to_q"])
    _inv_linear(out, f"{p}.to_k", sub["to_k"])
    _inv_linear(out, f"{p}.to_v", sub["to_v"])
    _inv_linear(out, f"{p}.to_out.0", sub["to_out"])


def _inv_spatial_transformer(out, p, sub, depth=1):
    _inv_norm(out, f"{p}.norm", sub["GroupNorm32_0"])
    _inv_conv(out, f"{p}.proj_in", sub["Conv_0"])
    _inv_conv(out, f"{p}.proj_out", sub["Conv_1"])
    for d in range(depth):
        bp = f"{p}.transformer_blocks.{d}"
        blk = sub[f"block{d}"]
        _inv_layernorm(out, f"{bp}.norm1", blk["LayerNorm_0"])
        _inv_layernorm(out, f"{bp}.norm2", blk["LayerNorm_1"])
        _inv_layernorm(out, f"{bp}.norm3", blk["LayerNorm_2"])
        _inv_cross_attention(out, f"{bp}.attn1", blk["attn1"])
        _inv_cross_attention(out, f"{bp}.attn2", blk["attn2"])
        _inv_linear(out, f"{bp}.ff.net.0.proj", blk["GEGLU_0"]["Dense_0"])
        _inv_linear(out, f"{bp}.ff.net.2", blk["Dense_0"])


def export_torch_unet(
    params,
    num_res_blocks: int,
    channel_mult: Sequence[int],
    attention_resolutions: Sequence[int],
    resblock_updown: bool = False,
    transformer_depth: int = 1,
) -> Dict[str, np.ndarray]:
    """flax `models.unet.UNetModel` params -> reference `UNetModel`
    state_dict (unet/unet.py:344-584). Same block-index replay as
    torch_convert.convert_torch_unet, run in reverse."""
    out: Dict[str, np.ndarray] = {}
    _inv_linear(out, "time_embed.0", params["Dense_0"])
    _inv_linear(out, "time_embed.2", params["Dense_1"])
    _inv_conv(out, "input_blocks.0.0", params["conv_in"])
    _inv_norm(out, "out.0", params["GroupNorm32_0"])
    _inv_conv(out, "out.2", params["conv_out"])

    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            _inv_resblock(out, f"input_blocks.{idx}.0",
                          params[f"down{level}_res{i}"])
            if ds in attention_resolutions:
                _inv_spatial_transformer(
                    out, f"input_blocks.{idx}.1",
                    params[f"down{level}_attn{i}"], transformer_depth)
            idx += 1
        if level != len(channel_mult) - 1:
            p = f"input_blocks.{idx}.0"
            if resblock_updown:
                _inv_resblock(out, p, params[f"down{level}_ds"])
            else:
                _inv_conv(out, f"{p}.op", params[f"down{level}_ds"]["Conv_0"])
            idx += 1
            ds *= 2

    _inv_resblock(out, "middle_block.0", params["mid_res1"])
    _inv_spatial_transformer(out, "middle_block.1", params["mid_attn"],
                             transformer_depth)
    _inv_resblock(out, "middle_block.2", params["mid_res2"])

    j = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            _inv_resblock(out, f"output_blocks.{j}.0",
                          params[f"up{level}_res{i}"])
            pos = 1
            if ds in attention_resolutions:
                _inv_spatial_transformer(
                    out, f"output_blocks.{j}.{pos}",
                    params[f"up{level}_attn{i}"], transformer_depth)
                pos += 1
            if level > 0 and i == num_res_blocks:
                p = f"output_blocks.{j}.{pos}"
                if resblock_updown:
                    _inv_resblock(out, p, params[f"up{level}_us"])
                else:
                    _inv_conv(out, f"{p}.conv",
                              params[f"up{level}_us"]["Conv_0"])
                ds //= 2
            j += 1

    return out


def export_torch_slot_attention(params) -> Dict[str, np.ndarray]:
    """flax SlotAttention params -> reference SlotAttention state_dict
    (video_based/models/savi.py:17-114)."""
    return {
        "norm_inputs.weight": _np(params["ln_in_scale"]),
        "norm_inputs.bias": _np(params["ln_in_bias"]),
        "project_k.weight": np.transpose(_np(params["wk"])),
        "project_v.weight": np.transpose(_np(params["wv"])),
        "project_q.0.weight": _np(params["ln_q_scale"]),
        "project_q.0.bias": _np(params["ln_q_bias"]),
        "project_q.1.weight": np.transpose(_np(params["wq"])),
        "gru.weight_ih": np.transpose(_np(params["gru_wi"])),
        "gru.bias_ih": _np(params["gru_bi"]),
        "gru.weight_hh": np.transpose(_np(params["gru_wh"])),
        "gru.bias_hh": _np(params["gru_bh"]),
        "mlp.0.weight": _np(params["ln_mlp_scale"]),
        "mlp.0.bias": _np(params["ln_mlp_bias"]),
        "mlp.1.weight": np.transpose(_np(params["w1"])),
        "mlp.1.bias": _np(params["b1"]),
        "mlp.3.weight": np.transpose(_np(params["w2"])),
        "mlp.3.bias": _np(params["b2"]),
    }


def _inv_deconv(out, prefix, sub):
    """Inverse of torch_convert._deconv: unflip spatial dims, restore
    torch's [C_in, C_out, kh, kw] layout."""
    k = np.transpose(_np(sub["kernel"]), (2, 3, 0, 1))
    out[f"{prefix}.weight"] = k[:, :, ::-1, ::-1]
    out[f"{prefix}.bias"] = _np(sub["bias"])


def _inv_sa_encoder_side(out, params, num_enc_layers, enc_resnet="",
                         enc_use_layer4=False):
    """Encode-side subset shared by SA/SAVi-family exports. `enc_resnet`
    selects the GN-ResNet backbone layout (every published
    CLEVRTex/CelebA/MOVi config). A frozen-DINO encoder is NOT exported:
    its weights are the unmodified public facebook/dino-vit* checkpoint
    (never trained in either framework), so the torch side re-creates
    them via from_pretrained."""
    out["init_latents"] = _np(params["init_latents"])
    for k, v in export_torch_slot_attention(
            params["slot_attention"]).items():
        out[f"slot_attention.{k}"] = v
    enc = params["encoder"]
    if enc_resnet:
        stages = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}
        for k, v in export_torch_resnet(
                enc["ResNet_0"], stages[enc_resnet],
                use_layer4=enc_use_layer4).items():
            out[f"encoder.{k}"] = v
    for i in range(num_enc_layers):
        _inv_conv(out, f"encoder.{i}.0", enc[f"ConvNormAct_{i}"]["Conv_0"])
    _inv_linear(out, "encoder_pos_embedding.dense",
                enc["SoftPositionEmbed_0"]["Dense_0"])
    _inv_layernorm(out, "encoder_out_layer.0", enc["LayerNorm_0"])
    _inv_linear(out, "encoder_out_layer.1", enc["Dense_0"])
    _inv_linear(out, "encoder_out_layer.3", enc["Dense_1"])


def export_torch_sa(params, num_enc_layers, num_dec_layers,
                    **enc_kwargs):
    """flax `models.sa.SA` params -> reference SA image model state_dict
    (img_based/models/slot_attention.py:115-425, plain-CNN encoder).
    Also the backbone for export_torch_savi."""
    out: Dict[str, np.ndarray] = {}
    _inv_sa_encoder_side(out, params, num_enc_layers, **enc_kwargs)

    dec = params["decoder"]
    _inv_linear(out, "decoder_pos_embedding.dense",
                dec["SoftPositionEmbed_0"]["Dense_0"])
    for i in range(num_dec_layers):
        _inv_deconv(out, f"decoder.{i}.0",
                    dec[f"DeconvNormAct_{i}"]["ConvTranspose_0"])
    _inv_conv(out, f"decoder.{num_dec_layers}", dec["Conv_0"])
    return out


def _export_predictor(out, pred_params, pred_num_layers, pred_num_heads,
                      pred_rnn=False, rnn_hidden_size=None):
    """Inverse of torch_convert._convert_predictor: emit 'predictor.*'
    keys for a bare TransformerPredictor or the RNNPredictorWrapper."""
    if not pred_rnn:
        items = export_torch_transformer_predictor(
            pred_params, pred_num_layers, pred_num_heads).items()
    else:
        items = export_torch_rnn_predictor(
            pred_params,
            lambda base: export_torch_transformer_predictor(
                base, pred_num_layers, pred_num_heads),
            hidden_size=rnn_hidden_size).items()
    for k, v in items:
        out[f"predictor.{k}"] = v


def export_torch_sa_diffusion(params, num_enc_layers, num_res_blocks,
                              channel_mult, attention_resolutions,
                              resblock_updown=False, transformer_depth=1,
                              enc_dec_dict=None, **enc_kwargs):
    """flax `models.slot_diffusion.SADiffusion` params -> reference
    SADiffusion state_dict (img_based/models/sa_diffusion.py:73-247,
    CondDDPM decoder). Diffusion schedule buffers and the LitEma shadow
    are recomputed/re-initialized by the torch ctor — load with
    strict=False."""
    out: Dict[str, np.ndarray] = {}
    _inv_sa_encoder_side(out, params, num_enc_layers, **enc_kwargs)
    unet = export_torch_unet(
        params["dm_decoder"]["unet"], num_res_blocks=num_res_blocks,
        channel_mult=channel_mult,
        attention_resolutions=attention_resolutions,
        resblock_updown=resblock_updown,
        transformer_depth=transformer_depth)
    for k, v in unet.items():
        out[f"dm_decoder.model.diffusion_model.{k}"] = v
    if enc_dec_dict is not None:
        for k, v in export_torch_vqvae(
                params["dm_decoder"]["vae"]["vqvae"],
                enc_dec_dict).items():
            out[f"dm_decoder.vae.vqvae.{k}"] = v
    return out


def export_torch_savi_diffusion(params, num_enc_layers, pred_num_layers,
                                pred_num_heads, num_res_blocks,
                                channel_mult, attention_resolutions,
                                resblock_updown=False,
                                transformer_depth=1,
                                pred_rnn=False, rnn_hidden_size=None,
                                enc_dec_dict=None, **enc_kwargs):
    """flax `models.slot_diffusion.SAViDiffusion` params -> reference
    SAViDiffusion state_dict (video_based/models/savi_diffusion.py:74-302).
    Schedule buffers / LitEma shadows are rebuilt by the torch ctor —
    load with strict=False."""
    out: Dict[str, np.ndarray] = {}
    savi = params["savi"]
    _inv_sa_encoder_side(out, savi, num_enc_layers, **enc_kwargs)
    _export_predictor(out, savi["predictor"], pred_num_layers,
                      pred_num_heads, pred_rnn=pred_rnn,
                      rnn_hidden_size=rnn_hidden_size)
    unet = export_torch_unet(
        params["dm_decoder"]["unet"], num_res_blocks=num_res_blocks,
        channel_mult=channel_mult,
        attention_resolutions=attention_resolutions,
        resblock_updown=resblock_updown,
        transformer_depth=transformer_depth)
    for k, v in unet.items():
        out[f"dm_decoder.model.diffusion_model.{k}"] = v
    if enc_dec_dict is not None:
        for k, v in export_torch_vqvae(
                params["dm_decoder"]["vae"]["vqvae"],
                enc_dec_dict).items():
            out[f"dm_decoder.vae.vqvae.{k}"] = v
    return out


def export_torch_slate(params, num_enc_layers, dec_num_layers,
                       **enc_kwargs):
    """flax `models.slate.SLATE` params -> reference SLATE state_dict
    (img_based/models/slate/slate.py:16-200)."""
    out: Dict[str, np.ndarray] = {}
    _inv_sa_encoder_side(out, params, num_enc_layers, **enc_kwargs)
    for k, v in export_torch_dvae(params["dvae"]).items():
        out[f"dvae.{k}"] = v
    for k, v in export_torch_steve_transformer(
            params["trans_decoder"], num_layers=dec_num_layers).items():
        out[f"trans_decoder.{k}"] = v
    return out


def export_torch_steve(params, num_enc_layers, pred_num_layers,
                       pred_num_heads, dec_num_layers,
                       pred_rnn=False, rnn_hidden_size=None,
                       **enc_kwargs):
    """flax `models.slate.STEVE` params -> reference STEVE state_dict
    (video_based/models/steve/steve.py:16-279)."""
    out: Dict[str, np.ndarray] = {}
    savi = params["savi"]
    _inv_sa_encoder_side(out, savi, num_enc_layers, **enc_kwargs)
    _export_predictor(out, savi["predictor"], pred_num_layers,
                      pred_num_heads, pred_rnn=pred_rnn,
                      rnn_hidden_size=rnn_hidden_size)
    for k, v in export_torch_dvae(params["dvae"]).items():
        out[f"dvae.{k}"] = v
    for k, v in export_torch_steve_transformer(
            params["trans_decoder"], num_layers=dec_num_layers).items():
        out[f"trans_decoder.{k}"] = v
    return out


def export_torch_ldm(params, enc_dec_dict, num_res_blocks, channel_mult,
                     attention_resolutions, resblock_updown=False,
                     transformer_depth=1):
    """flax `models.diffusion.LDM` params -> reference LDM state_dict
    (ddpm/ldm.py:18-137). Schedule buffers / LitEma are rebuilt by the
    torch ctor — load with strict=False."""
    out: Dict[str, np.ndarray] = {}
    unet = export_torch_unet(
        params["unet"], num_res_blocks=num_res_blocks,
        channel_mult=channel_mult,
        attention_resolutions=attention_resolutions,
        resblock_updown=resblock_updown,
        transformer_depth=transformer_depth)
    for k, v in unet.items():
        out[f"model.diffusion_model.{k}"] = v
    for k, v in export_torch_vqvae(params["vae"]["vqvae"],
                                   enc_dec_dict).items():
        out[f"vae.vqvae.{k}"] = v
    return out


def export_torch_ldm_slotformer(params, enc_dec_dict, rollout_num_layers,
                                rollout_num_heads, num_res_blocks,
                                channel_mult, attention_resolutions,
                                resblock_updown=False,
                                transformer_depth=1):
    """flax `models.slotformer.LDMSlotFormer` params -> reference
    LDMSlotFormer state_dict (vp_vqa/models/ldm_slotformer.py:15-215)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in export_torch_slot_rollouter(
            {"step": params["rollouter"]["step"]},
            num_layers=rollout_num_layers,
            num_heads=rollout_num_heads).items():
        out[f"rollouter.{k}"] = v
    for k, v in export_torch_ldm(
            params["dm_decoder"], enc_dec_dict,
            num_res_blocks=num_res_blocks, channel_mult=channel_mult,
            attention_resolutions=attention_resolutions,
            resblock_updown=resblock_updown,
            transformer_depth=transformer_depth).items():
        out[f"dm_decoder.{k}"] = v
    return out


def export_torch_savi(params, num_enc_layers, num_dec_layers,
                      pred_num_layers, pred_num_heads,
                      pred_rnn=False, rnn_hidden_size=None,
                      **enc_kwargs):
    """flax `models.savi.SAVi` params -> reference SAVi video model
    state_dict (video_based/models/savi.py:117-565, plain-CNN encoder,
    transformer predictor without the RNN wrapper)."""
    out = export_torch_sa(params, num_enc_layers, num_dec_layers,
                          **enc_kwargs)
    _export_predictor(out, params["predictor"], pred_num_layers,
                      pred_num_heads, pred_rnn=pred_rnn,
                      rnn_hidden_size=rnn_hidden_size)
    return out


def _inv_mha(out, prefix, sub, num_heads):
    """Inverse of torch_convert._mha: flax MultiHeadDotProductAttention
    subtree -> torch nn.MultiheadAttention packed in_proj layout."""
    D = _np(sub["out"]["bias"]).shape[0]
    ws, bs = [], []
    for name in ("query", "key", "value"):
        ws.append(np.transpose(_np(sub[name]["kernel"]).reshape(D, D)))
        bs.append(_np(sub[name]["bias"]).reshape(D))
    out[f"{prefix}.in_proj_weight"] = np.concatenate(ws, axis=0)
    out[f"{prefix}.in_proj_bias"] = np.concatenate(bs, axis=0)
    out[f"{prefix}.out_proj.weight"] = np.transpose(
        _np(sub["out"]["kernel"]).reshape(D, D))
    out[f"{prefix}.out_proj.bias"] = _np(sub["out"]["bias"])


def export_torch_transformer_predictor(params, num_layers, num_heads):
    """flax TransformerPredictor params -> reference TransformerPredictor
    state_dict (predictor.py:20-44)."""
    out: Dict[str, np.ndarray] = {}
    for i in range(num_layers):
        p = f"transformer_encoder.layers.{i}"
        _inv_mha(out, f"{p}.self_attn", params[f"attn{i}"], num_heads)
        _inv_layernorm(out, f"{p}.norm1", params[f"LayerNorm_{2 * i}"])
        _inv_layernorm(out, f"{p}.norm2", params[f"LayerNorm_{2 * i + 1}"])
        _inv_linear(out, f"{p}.linear1", params[f"Dense_{2 * i}"])
        _inv_linear(out, f"{p}.linear2", params[f"Dense_{2 * i + 1}"])
    return out


def export_torch_mlp_predictor(params, num_linear):
    """flax ResidualMLPPredictor params -> reference ResidualMLPPredictor
    state_dict (predictor.py:47-73)."""
    out: Dict[str, np.ndarray] = {}
    _inv_layernorm(out, "ln", params["LayerNorm_0"])
    for i in range(num_linear):
        _inv_linear(out, f"mlp.{2 * i}", params[f"Dense_{i}"])
    return out


def export_torch_rnn_predictor(params, export_base_fn, hidden_size,
                               rnn_num_layers=1):
    """flax RNNPredictorWrapper params -> reference RNNPredictorWrapper
    state_dict (predictor.py:76-135). torch keeps two LSTM bias vectors
    whose SUM the flax cell stores; the exported split puts the whole
    combined bias in bias_ih and zeros in bias_hh — an identical affine
    map, so forwards are bit-equal (exact split values are not
    recoverable and never observable)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in export_base_fn(params["base"]).items():
        out[f"base_predictor.{k}"] = v
    _inv_linear(out, "out_projector", params["out_proj"])
    H = hidden_size
    for layer in range(rnn_num_layers):
        cell = params[f"lstm{layer}"]
        wi = np.concatenate(
            [np.transpose(_np(cell[f"i{g}"]["kernel"]))
             for g in ("i", "f", "g", "o")], axis=0)
        wh = np.concatenate(
            [np.transpose(_np(cell[f"h{g}"]["kernel"]))
             for g in ("i", "f", "g", "o")], axis=0)
        b = np.concatenate([_np(cell[f"h{g}"]["bias"])
                            for g in ("i", "f", "g", "o")], axis=0)
        out[f"rnn.weight_ih_l{layer}"] = wi
        out[f"rnn.weight_hh_l{layer}"] = wh
        out[f"rnn.bias_ih_l{layer}"] = b
        out[f"rnn.bias_hh_l{layer}"] = np.zeros_like(b)
    return out


def export_torch_quantizer(params):
    """flax quantizer params -> reference VectorQuantizer2 state_dict
    (vqvae/quantize.py:11-140)."""
    return {"embedding.weight": _np(params["embedding"])}


def export_torch_resnet(params, stage_sizes, use_layer4=True):
    """flax `models.resnet.ResNet` params -> reference GN-ResNet18/34
    state_dict (video_based/models/resnet.py:150-346)."""
    out: Dict[str, np.ndarray] = {}
    _inv_convnb(out, "conv1", params["Conv_0"])
    _inv_norm(out, "bn1", params["_GN_0"])
    bidx = 0
    for stage in range(4 if use_layer4 else 3):
        for i in range(stage_sizes[stage]):
            p = f"layer{stage + 1}.{i}"
            blk = params[f"BasicBlock_{bidx}"]
            _inv_convnb(out, f"{p}.conv1", blk["Conv_0"])
            _inv_norm(out, f"{p}.bn1", blk["_GN_0"])
            _inv_convnb(out, f"{p}.conv2", blk["Conv_1"])
            _inv_norm(out, f"{p}.bn2", blk["_GN_1"])
            if "Conv_2" in blk:
                _inv_convnb(out, f"{p}.downsample.0", blk["Conv_2"])
                _inv_norm(out, f"{p}.downsample.1", blk["_GN_2"])
            bidx += 1
    return out


def _inv_conv2d_block(out, p, sub):
    """Inverse of torch_convert._conv2d_block (steve_utils.py:95-119)."""
    _inv_convnb(out, f"{p}.m", sub["Conv_0"])
    g = sub["GroupNorm_0"]
    out[f"{p}.weight"] = _np(g["scale"])
    out[f"{p}.bias"] = _np(g["bias"])


def export_torch_dvae(params):
    """flax `models.dvae.DVAE` params -> reference dVAE state_dict
    (steve/dVAE.py:9-155)."""
    out: Dict[str, np.ndarray] = {}
    for i in range(7):
        _inv_conv2d_block(out, f"encoder.{i}", params[f"enc_blocks_{i}"])
    _inv_conv(out, "encoder.7", params["enc_out"])
    for i in range(5):
        _inv_conv2d_block(out, f"decoder.{i}", params[f"dec_blocks1_{i}"])
    for i in range(4):
        _inv_conv2d_block(out, f"decoder.{i + 6}", params[f"dec_blocks2_{i}"])
    _inv_conv(out, "decoder.11", params["dec_out"])
    return out


def export_torch_slot_rollouter(params, num_layers, num_heads):
    """flax SlotRollouter params -> reference SlotRollouter state_dict
    (vp_vqa/models/slotformer.py:46-135). The sine temporal PE is a frozen
    torch buffer recomputed on the flax side — load with strict=False."""
    out: Dict[str, np.ndarray] = {}
    step = params["step"]
    _inv_linear(out, "in_proj", step["in_proj"])
    _inv_linear(out, "out_proj", step["out_proj"])
    for i in range(num_layers):
        p = f"transformer_encoder.layers.{i}"
        layer = step[f"layer{i}"]
        _inv_mha(out, f"{p}.self_attn", layer["attn"], num_heads)
        _inv_layernorm(out, f"{p}.norm1", layer["LayerNorm_0"])
        _inv_layernorm(out, f"{p}.norm2", layer["LayerNorm_1"])
        _inv_linear(out, f"{p}.linear1", layer["Dense_0"])
        _inv_linear(out, f"{p}.linear2", layer["Dense_1"])
    return out


def export_torch_physion_readout(params):
    """flax PhysionReadout params -> reference PhysionReadout state_dict
    (vp_vqa/models/readout.py:12-109; the pair-index buffer is recomputed
    on both sides — load with strict=False)."""
    out: Dict[str, np.ndarray] = {}
    _inv_linear(out, "linear1", params["linear1"])
    _inv_linear(out, "linear2", params["linear2"])
    return out


def export_torch_steve_transformer(params, num_layers):
    """flax STEVETransformerDecoder params -> reference
    STEVETransformerDecoder / SLATETransformerDecoder state_dict
    (steve_transformer.py:245-334)."""
    out: Dict[str, np.ndarray] = {}
    _inv_linear(out, "in_proj", params["in_proj"])
    out["tok_emb.weight"] = _np(params["tok_emb"]["embedding"])
    out["pos_emb.pe"] = _np(params["pos_emb"])
    _inv_layernorm(out, "tf_dec.layer_norm", params["final_ln"])
    _inv_linear(out, "head", params["head"])
    for i in range(num_layers):
        p = f"tf_dec.blocks.{i}"
        blk = params[f"block{i}"]
        _inv_layernorm(out, f"{p}.self_attn_layer_norm", blk["self_attn_ln"])
        _inv_layernorm(out, f"{p}.encoder_decoder_attn_layer_norm",
                       blk["cross_ln"])
        _inv_layernorm(out, f"{p}.ffn_layer_norm", blk["ffn_ln"])
        for name, sub in (("self_attn", blk["self_attn"]),
                          ("encoder_decoder_attn", blk["cross_attn"])):
            for k in ("proj_q", "proj_k", "proj_v", "proj_o"):
                _inv_linear(out, f"{p}.{name}.{k}", sub[k])
        _inv_linear(out, f"{p}.ffn.0", blk["ffn_fc1"])
        _inv_linear(out, f"{p}.ffn.2", blk["ffn_fc2"])
    return out


def _inv_vq_resblock(out, p, sub, conv_shortcut=False):
    """Inverse of torch_convert._vq_resblock (vqvae/modules.py:54-113).

    The reference stores an in/out-channel-changing shortcut as
    `nin_shortcut` (1x1) by default and `conv_shortcut` (3x3) when
    `use_conv_shortcut`; the kernel size in the flax tree disambiguates."""
    _inv_norm(out, f"{p}.norm1", sub["GroupNorm32_0"])
    _inv_conv(out, f"{p}.conv1", sub["Conv_0"])
    _inv_norm(out, f"{p}.norm2", sub["GroupNorm32_1"])
    _inv_conv(out, f"{p}.conv2", sub["Conv_1"])
    if "Conv_2" in sub:
        kh = _np(sub["Conv_2"]["kernel"]).shape[0]
        name = "conv_shortcut" if kh == 3 else "nin_shortcut"
        _inv_conv(out, f"{p}.{name}", sub["Conv_2"])


def _inv_vq_attnblock(out, p, sub):
    _inv_norm(out, f"{p}.norm", sub["GroupNorm32_0"])
    _inv_conv(out, f"{p}.q", sub["Conv_0"])
    _inv_conv(out, f"{p}.k", sub["Conv_1"])
    _inv_conv(out, f"{p}.v", sub["Conv_2"])
    _inv_conv(out, f"{p}.proj_out", sub["Conv_3"])


def export_torch_vqvae(params, enc_dec_dict):
    """flax `models.vqvae.VQVAE` params -> reference VQVAE state_dict
    (vqvae/VQVAE.py:40-152 over modules.py), replaying the same
    level/block bookkeeping as convert_torch_vqvae in reverse."""
    ch_mult = list(enc_dec_dict["ch_mult"])
    nrb = enc_dec_dict["num_res_blocks"]
    attn_res = set(enc_dec_dict.get("attn_resolutions", ()))
    res = enc_dec_dict["resolution"]
    vanilla = enc_dec_dict.get("attn_type", "vanilla") == "vanilla"

    out: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    _inv_conv(out, "encoder.conv_in", enc["conv_in"])
    _inv_vq_resblock(out, "encoder.mid.block_1", enc["mid_res1"])
    _inv_vq_resblock(out, "encoder.mid.block_2", enc["mid_res2"])
    _inv_norm(out, "encoder.norm_out", enc["norm_out"])
    _inv_conv(out, "encoder.conv_out", enc["conv_out"])
    if vanilla:
        _inv_vq_attnblock(out, "encoder.mid.attn_1", enc["mid_attn"])
    cur = res
    for level in range(len(ch_mult)):
        for i in range(nrb):
            _inv_vq_resblock(out, f"encoder.down.{level}.block.{i}",
                             enc[f"down{level}_res{i}"])
            if vanilla and cur in attn_res:
                _inv_vq_attnblock(out, f"encoder.down.{level}.attn.{i}",
                                  enc[f"down{level}_attn{i}"])
        if level != len(ch_mult) - 1:
            _inv_conv(out, f"encoder.down.{level}.downsample.conv",
                      enc[f"down{level}_ds"])
            cur //= 2

    dec = params["decoder"]
    _inv_conv(out, "decoder.conv_in", dec["conv_in"])
    _inv_vq_resblock(out, "decoder.mid.block_1", dec["mid_res1"])
    _inv_vq_resblock(out, "decoder.mid.block_2", dec["mid_res2"])
    _inv_norm(out, "decoder.norm_out", dec["norm_out"])
    _inv_conv(out, "decoder.conv_out", dec["conv_out"])
    if vanilla:
        _inv_vq_attnblock(out, "decoder.mid.attn_1", dec["mid_attn"])
    cur = res // 2 ** (len(ch_mult) - 1)
    for level in reversed(range(len(ch_mult))):
        for i in range(nrb + 1):
            _inv_vq_resblock(out, f"decoder.up.{level}.block.{i}",
                             dec[f"up{level}_res{i}"])
            if vanilla and cur in attn_res:
                _inv_vq_attnblock(out, f"decoder.up.{level}.attn.{i}",
                                  dec[f"up{level}_attn{i}"])
        if level != 0:
            _inv_conv(out, f"decoder.up.{level}.upsample.conv",
                      dec[f"up{level}_us"])
            cur *= 2

    out["quantize.embedding.weight"] = _np(
        params["quantize"]["embedding"])
    _inv_conv(out, "quant_conv", params["quant_conv"])
    _inv_conv(out, "post_quant_conv", params["post_quant_conv"])
    return out

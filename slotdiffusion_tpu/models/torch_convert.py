"""Torch -> flax parameter converters for reference checkpoints.

The reference publishes torch checkpoints (docs/benchmark.md:13-16); these
converters map their state dicts onto the rebuild's flax param trees so
real pretrained weights (and the parity tests, tests/test_reference_parity
.py) can drive the JAX models. Input is a plain `{name: np.ndarray}` dict —
call `.numpy()` on torch tensors or pass `state_dict` through
`numpy_state_dict`.

Layout rules:
    conv   [F, C, kh, kw]  -> [kh, kw, C, F]   (transpose 2,3,1,0)
    linear [out, in]       -> [in, out]        (transpose)
    norm   weight/bias     -> scale/bias       (unchanged vectors)
"""

from typing import Dict, Sequence

import numpy as np


def numpy_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict to {name: float64-preserving np.ndarray}.

    COPIES every tensor: `Tensor.numpy()` shares storage with the live
    module, so without the copy an `optimizer.step()` (or any in-place
    torch op) would silently mutate the converted tree — transposed
    kernels are numpy views and alias just the same.
    """
    out = {}
    for k, v in state_dict.items():
        out[k] = np.array(v.detach().cpu().numpy()) if hasattr(v, "detach") \
            else np.array(v)
    return out


def _conv(sd, prefix):
    w = sd[f"{prefix}.weight"]
    return {"kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": sd[f"{prefix}.bias"]}


def _linear(sd, prefix, bias=True):
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"])}
    if bias:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd, prefix):
    return {"GroupNorm_0": {"scale": sd[f"{prefix}.weight"],
                            "bias": sd[f"{prefix}.bias"]}}


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _resblock(sd, p):
    """Reference ResBlock (unet/unet.py:182-285) -> flax ResBlock subtree."""
    out = {
        "GroupNorm32_0": _norm(sd, f"{p}.in_layers.0"),
        "Conv_0": _conv(sd, f"{p}.in_layers.2"),
        "Dense_0": _linear(sd, f"{p}.emb_layers.1"),
        "GroupNorm32_1": _norm(sd, f"{p}.out_layers.0"),
        "Conv_1": _conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["Conv_2"] = _conv(sd, f"{p}.skip_connection")
    return out


def _cross_attention(sd, p):
    """Reference CrossAttention (unet/attention.py:157-206)."""
    return {
        "to_q": _linear(sd, f"{p}.to_q", bias=False),
        "to_k": _linear(sd, f"{p}.to_k", bias=False),
        "to_v": _linear(sd, f"{p}.to_v", bias=False),
        "to_out": _linear(sd, f"{p}.to_out.0"),
    }


def _spatial_transformer(sd, p, depth=1):
    """Reference SpatialTransformer (unet/attention.py:254-308)."""
    out = {
        "GroupNorm32_0": _norm(sd, f"{p}.norm"),
        "Conv_0": _conv(sd, f"{p}.proj_in"),
        "Conv_1": _conv(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        bp = f"{p}.transformer_blocks.{d}"
        out[f"block{d}"] = {
            "LayerNorm_0": _layernorm(sd, f"{bp}.norm1"),
            "LayerNorm_1": _layernorm(sd, f"{bp}.norm2"),
            "LayerNorm_2": _layernorm(sd, f"{bp}.norm3"),
            "attn1": _cross_attention(sd, f"{bp}.attn1"),
            "attn2": _cross_attention(sd, f"{bp}.attn2"),
            # ff.net = [GEGLU(proj), Dropout, Linear]
            "GEGLU_0": {"Dense_0": _linear(sd, f"{bp}.ff.net.0.proj")},
            "Dense_0": _linear(sd, f"{bp}.ff.net.2"),
        }
    return out


def convert_torch_unet(
    state_dict,
    num_res_blocks: int,
    channel_mult: Sequence[int],
    attention_resolutions: Sequence[int],
    resblock_updown: bool = False,
    transformer_depth: int = 1,
):
    """Reference `UNetModel` state_dict -> flax `models.unet.UNetModel`
    params. The walk replays the reference ctor's block-index bookkeeping
    (unet/unet.py:407-538) to recover which sequential index holds which
    (level, i) block."""
    sd = numpy_state_dict(state_dict)
    params = {
        "Dense_0": _linear(sd, "time_embed.0"),
        "Dense_1": _linear(sd, "time_embed.2"),
        "conv_in": _conv(sd, "input_blocks.0.0"),
        "GroupNorm32_0": _norm(sd, "out.0"),
        "conv_out": _conv(sd, "out.2"),
    }

    idx = 1  # input_blocks.0 is conv_in
    ds = 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            p = f"input_blocks.{idx}.0"
            params[f"down{level}_res{i}"] = _resblock(sd, p)
            if ds in attention_resolutions:
                params[f"down{level}_attn{i}"] = _spatial_transformer(
                    sd, f"input_blocks.{idx}.1", transformer_depth)
            idx += 1
        if level != len(channel_mult) - 1:
            p = f"input_blocks.{idx}.0"
            if resblock_updown:
                params[f"down{level}_ds"] = _resblock(sd, p)
            else:
                params[f"down{level}_ds"] = {"Conv_0": _conv(sd, f"{p}.op")}
            idx += 1
            ds *= 2

    params["mid_res1"] = _resblock(sd, "middle_block.0")
    params["mid_attn"] = _spatial_transformer(
        sd, "middle_block.1", transformer_depth)
    params["mid_res2"] = _resblock(sd, "middle_block.2")

    j = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            params[f"up{level}_res{i}"] = _resblock(
                sd, f"output_blocks.{j}.0")
            pos = 1
            if ds in attention_resolutions:
                params[f"up{level}_attn{i}"] = _spatial_transformer(
                    sd, f"output_blocks.{j}.{pos}", transformer_depth)
                pos += 1
            if level > 0 and i == num_res_blocks:
                p = f"output_blocks.{j}.{pos}"
                if resblock_updown:
                    params[f"up{level}_us"] = _resblock(sd, p)
                else:
                    params[f"up{level}_us"] = {
                        "Conv_0": _conv(sd, f"{p}.conv")}
                ds //= 2
            j += 1

    return params


def convert_torch_slot_attention(state_dict):
    """Reference SlotAttention (video_based/models/savi.py:17-114, identical
    img copy slot_attention.py:15-104) -> flax `models.slot_attention
    .SlotAttention` params.

    Both GRU formulations pack gates (r | z | n) and keep the hidden bias
    inside the reset gate's tanh argument, so weight_ih/weight_hh transpose
    directly onto gru_wi/gru_wh."""
    sd = numpy_state_dict(state_dict)
    return {
        "ln_in_scale": sd["norm_inputs.weight"],
        "ln_in_bias": sd["norm_inputs.bias"],
        "wk": np.transpose(sd["project_k.weight"]),
        "wv": np.transpose(sd["project_v.weight"]),
        "ln_q_scale": sd["project_q.0.weight"],
        "ln_q_bias": sd["project_q.0.bias"],
        "wq": np.transpose(sd["project_q.1.weight"]),
        "gru_wi": np.transpose(sd["gru.weight_ih"]),
        "gru_bi": sd["gru.bias_ih"],
        "gru_wh": np.transpose(sd["gru.weight_hh"]),
        "gru_bh": sd["gru.bias_hh"],
        "ln_mlp_scale": sd["mlp.0.weight"],
        "ln_mlp_bias": sd["mlp.0.bias"],
        "w1": np.transpose(sd["mlp.1.weight"]),
        "b1": sd["mlp.1.bias"],
        "w2": np.transpose(sd["mlp.3.weight"]),
        "b2": sd["mlp.3.bias"],
    }


def _deconv(sd, prefix):
    """torch ConvTranspose2d weight [C_in, C_out, kh, kw] -> flax
    nn.ConvTranspose kernel [kh, kw, C_in, C_out]. flax's conv_transpose
    correlates the kernel as-is (transpose_kernel=False) while torch's
    transposed conv applies the spatially-flipped kernel, so the spatial
    dims flip in conversion (verified exact in
    tests/test_reference_parity.py::test_sa_full_model_matches_reference).
    """
    w = sd[f"{prefix}.weight"]
    return {"kernel": np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)),
            "bias": sd[f"{prefix}.bias"]}


def _sa_backbone(sd, num_enc_layers, num_dec_layers, **enc_kwargs):
    """Shared SA/SAVi backbone walk: the encode side (below) plus the
    spatial-broadcast deconv decoder with its own SoftPositionEmbed and
    the final 1x1 RGBA conv."""
    params = _sa_encoder_side(sd, num_enc_layers, **enc_kwargs)
    dec = {"SoftPositionEmbed_0": {
        "Dense_0": _linear(sd, "decoder_pos_embedding.dense")}}
    for i in range(num_dec_layers):
        dec[f"DeconvNormAct_{i}"] = {
            "ConvTranspose_0": _deconv(sd, f"decoder.{i}.0")}
    dec["Conv_0"] = _conv(sd, f"decoder.{num_dec_layers}")
    params["decoder"] = dec
    return params


def convert_torch_sa(state_dict, num_enc_layers, num_dec_layers,
                     **enc_kwargs):
    """Full reference SA image model (img_based/models/slot_attention.py:
    115-425, plain-CNN encoder variant) -> flax `models.sa.SA` params."""
    sd = numpy_state_dict(state_dict)
    return _sa_backbone(sd, num_enc_layers, num_dec_layers, **enc_kwargs)


_RESNET_STAGES = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}


def _sa_encoder_side(sd, num_enc_layers, enc_resnet="",
                     enc_use_layer4=False, enc_dino=False,
                     dino_small=True):
    """The encode-side subset of the SA backbone (no deconv decoder):
    backbone + SoftPositionEmbed + LN/MLP head, init_latents,
    SlotAttention. Shared by every SA/SAVi-family converter.

    Backbone variants mirror the reference's _build_encoder
    (img_based/models/slot_attention.py:182-245): the plain CNN stack
    (`num_enc_layers` conv_norm_act blocks), GN-ResNet18/34
    (`enc_resnet`, used by every published CLEVRTex/CelebA/MOVi config),
    or a frozen DINO ViT (`enc_dino`, the COCO/VOC configs — HF ViTModel
    weights under 'encoder.dino.')."""
    if enc_resnet:
        enc = {"ResNet_0": convert_torch_resnet(
            _sub_state(sd, "encoder."), _RESNET_STAGES[enc_resnet],
            use_layer4=enc_use_layer4)}
    elif enc_dino:
        from .dino import convert_hf_dino_tree
        enc = {"DINOEncoder_0": convert_hf_dino_tree(
            _sub_state(sd, "encoder.dino."),
            num_heads=6 if dino_small else 12)}
    else:
        enc = {}
        for i in range(num_enc_layers):
            enc[f"ConvNormAct_{i}"] = {"Conv_0": _conv(sd, f"encoder.{i}.0")}
    enc["SoftPositionEmbed_0"] = {
        "Dense_0": _linear(sd, "encoder_pos_embedding.dense")}
    enc["LayerNorm_0"] = _layernorm(sd, "encoder_out_layer.0")
    enc["Dense_0"] = _linear(sd, "encoder_out_layer.1")
    enc["Dense_1"] = _linear(sd, "encoder_out_layer.3")
    sa_sd = {k[len("slot_attention."):]: v for k, v in sd.items()
             if k.startswith("slot_attention.")}
    return {
        "init_latents": sd["init_latents"],
        "slot_attention": convert_torch_slot_attention(sa_sd),
        "encoder": enc,
    }


def convert_torch_sa_diffusion(state_dict, num_enc_layers,
                               num_res_blocks, channel_mult,
                               attention_resolutions,
                               resblock_updown=False,
                               transformer_depth=1, enc_dec_dict=None,
                               **enc_kwargs):
    """Full reference SADiffusion (img_based/models/sa_diffusion.py:73-247,
    plain-CNN encoder, CondDDPM decoder) -> flax
    `models.slot_diffusion.SADiffusion` params: the SA encode side with
    the WMask slot attention plus the slot-conditioned denoising UNet
    (`dm_decoder.model.diffusion_model` on the torch side)."""
    sd = numpy_state_dict(state_dict)
    params = _sa_encoder_side(sd, num_enc_layers, **enc_kwargs)
    unet_sd = {k[len("dm_decoder.model.diffusion_model."):]: v
               for k, v in sd.items()
               if k.startswith("dm_decoder.model.diffusion_model.")}
    params["dm_decoder"] = {"unet": convert_torch_unet(
        unet_sd, num_res_blocks=num_res_blocks, channel_mult=channel_mult,
        attention_resolutions=attention_resolutions,
        resblock_updown=resblock_updown,
        transformer_depth=transformer_depth)}
    if enc_dec_dict is not None:
        # LDM decoder (sa_ldm/savi_ldm configs): the frozen VQ-VAE first
        # stage rides inside the same checkpoint under dm_decoder.vae
        params["dm_decoder"]["vae"] = {"vqvae": convert_torch_vqvae(
            _sub_state(sd, "dm_decoder.vae.vqvae."), enc_dec_dict)}
    return params


def convert_torch_savi_diffusion(state_dict, num_enc_layers,
                                 pred_num_layers, pred_num_heads,
                                 num_res_blocks, channel_mult,
                                 attention_resolutions,
                                 resblock_updown=False,
                                 transformer_depth=1,
                                 pred_rnn=False, rnn_hidden_size=None,
                                 enc_dec_dict=None, **enc_kwargs):
    """Full reference SAViDiffusion (video_based/models/savi_diffusion.py:
    74-302, plain-CNN encoder, transformer predictor, CondDDPM decoder) ->
    flax `models.slot_diffusion.SAViDiffusion` params. The flax model
    nests the recurrent encode side under `savi`; the torch module is
    flat."""
    sd = numpy_state_dict(state_dict)
    savi = _sa_encoder_side(sd, num_enc_layers, **enc_kwargs)
    savi["predictor"] = _convert_predictor(
        sd, pred_num_layers, pred_num_heads, pred_rnn=pred_rnn,
        rnn_hidden_size=rnn_hidden_size)
    unet_sd = {k[len("dm_decoder.model.diffusion_model."):]: v
               for k, v in sd.items()
               if k.startswith("dm_decoder.model.diffusion_model.")}
    dm = {"unet": convert_torch_unet(
        unet_sd, num_res_blocks=num_res_blocks,
        channel_mult=channel_mult,
        attention_resolutions=attention_resolutions,
        resblock_updown=resblock_updown,
        transformer_depth=transformer_depth)}
    if enc_dec_dict is not None:
        dm["vae"] = {"vqvae": convert_torch_vqvae(
            _sub_state(sd, "dm_decoder.vae.vqvae."), enc_dec_dict)}
    return {"savi": savi, "dm_decoder": dm}


def _sub_state(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def _convert_predictor(sd, pred_num_layers, pred_num_heads,
                       pred_rnn=False, rnn_hidden_size=None):
    """Predictor subtree dispatch for the full-model converters: bare
    TransformerPredictor, or the reference-default RNNPredictorWrapper
    around it (pred_rnn=True, savi.py:338-347)."""
    pred_sd = _sub_state(sd, "predictor.")
    if not pred_rnn:
        return convert_torch_transformer_predictor(
            pred_sd, num_layers=pred_num_layers, num_heads=pred_num_heads)
    base = convert_torch_transformer_predictor(
        _sub_state(pred_sd, "base_predictor."),
        num_layers=pred_num_layers, num_heads=pred_num_heads)
    return convert_torch_rnn_predictor(pred_sd, base,
                                       hidden_size=rnn_hidden_size)


def convert_torch_slate(state_dict, num_enc_layers, dec_num_layers,
                        **enc_kwargs):
    """Full reference SLATE (img_based/models/slate/slate.py:16-200) ->
    flax `models.slate.SLATE` params: SA encode side + frozen dVAE +
    SLATETransformerDecoder."""
    sd = numpy_state_dict(state_dict)
    params = _sa_encoder_side(sd, num_enc_layers, **enc_kwargs)
    params["dvae"] = convert_torch_dvae(_sub_state(sd, "dvae."))
    params["trans_decoder"] = convert_torch_steve_transformer(
        _sub_state(sd, "trans_decoder."), num_layers=dec_num_layers)
    return params


def convert_torch_steve(state_dict, num_enc_layers, pred_num_layers,
                        pred_num_heads, dec_num_layers,
                        pred_rnn=False, rnn_hidden_size=None,
                        **enc_kwargs):
    """Full reference STEVE (video_based/models/steve/steve.py:16-279,
    transformer predictor without the RNN wrapper) -> flax
    `models.slate.STEVE` params: SAVi encode side (nested under `savi`)
    + frozen dVAE + STEVETransformerDecoder."""
    sd = numpy_state_dict(state_dict)
    savi = _sa_encoder_side(sd, num_enc_layers, **enc_kwargs)
    savi["predictor"] = _convert_predictor(
        sd, pred_num_layers, pred_num_heads, pred_rnn=pred_rnn,
        rnn_hidden_size=rnn_hidden_size)
    return {
        "savi": savi,
        "dvae": convert_torch_dvae(_sub_state(sd, "dvae.")),
        "trans_decoder": convert_torch_steve_transformer(
            _sub_state(sd, "trans_decoder."), num_layers=dec_num_layers),
    }


def convert_torch_ldm(state_dict, enc_dec_dict, num_res_blocks,
                      channel_mult, attention_resolutions,
                      resblock_updown=False, transformer_depth=1):
    """Reference LDM (ddpm/ldm.py:18-137): denoising UNet
    (`model.diffusion_model`) + frozen VQ-VAE first stage (`vae.vqvae`)
    -> flax `models.diffusion.LDM` params."""
    sd = numpy_state_dict(state_dict)
    return {
        "unet": convert_torch_unet(
            _sub_state(sd, "model.diffusion_model."),
            num_res_blocks=num_res_blocks, channel_mult=channel_mult,
            attention_resolutions=attention_resolutions,
            resblock_updown=resblock_updown,
            transformer_depth=transformer_depth),
        "vae": {"vqvae": convert_torch_vqvae(
            _sub_state(sd, "vae.vqvae."), enc_dec_dict)},
    }


def convert_torch_ldm_slotformer(state_dict, enc_dec_dict,
                                 rollout_num_layers, rollout_num_heads,
                                 num_res_blocks, channel_mult,
                                 attention_resolutions,
                                 resblock_updown=False,
                                 transformer_depth=1):
    """Full reference LDMSlotFormer (vp_vqa/models/ldm_slotformer.py:
    15-215): SlotRollouter dynamics + frozen slot-conditioned LDM decoder
    -> flax `models.slotformer.LDMSlotFormer` params."""
    sd = numpy_state_dict(state_dict)
    return {
        "rollouter": convert_torch_slot_rollouter(
            _sub_state(sd, "rollouter."), num_layers=rollout_num_layers,
            num_heads=rollout_num_heads),
        "dm_decoder": convert_torch_ldm(
            _sub_state(sd, "dm_decoder."), enc_dec_dict,
            num_res_blocks=num_res_blocks, channel_mult=channel_mult,
            attention_resolutions=attention_resolutions,
            resblock_updown=resblock_updown,
            transformer_depth=transformer_depth),
    }


def convert_torch_savi(state_dict, num_enc_layers, num_dec_layers,
                       pred_num_layers, pred_num_heads,
                       pred_rnn=False, rnn_hidden_size=None,
                       **enc_kwargs):
    """Full reference SAVi video model (video_based/models/savi.py:117-565,
    plain-CNN encoder, transformer predictor without the RNN wrapper) ->
    flax `models.savi.SAVi` params: the SA backbone plus the slot
    predictor that carries slots across frames."""
    sd = numpy_state_dict(state_dict)
    params = _sa_backbone(sd, num_enc_layers, num_dec_layers, **enc_kwargs)
    params["predictor"] = _convert_predictor(
        sd, pred_num_layers, pred_num_heads, pred_rnn=pred_rnn,
        rnn_hidden_size=rnn_hidden_size)
    return params


def _mha(sd, prefix, num_heads):
    """torch nn.MultiheadAttention (packed in_proj) -> flax
    MultiHeadDotProductAttention subtree. Both split the packed feature
    dim into heads contiguously, so a reshape after transpose aligns."""
    w = sd[f"{prefix}.in_proj_weight"]        # [3D, D]
    b = sd[f"{prefix}.in_proj_bias"]          # [3D]
    D = w.shape[1]
    hd = D // num_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = np.transpose(w[i * D:(i + 1) * D])        # [D_in, D_out]
        out[name] = {"kernel": wi.reshape(D, num_heads, hd),
                     "bias": b[i * D:(i + 1) * D].reshape(num_heads, hd)}
    wo = np.transpose(sd[f"{prefix}.out_proj.weight"])  # [D_in, D_out]
    out["out"] = {"kernel": wo.reshape(num_heads, hd, D),
                  "bias": sd[f"{prefix}.out_proj.bias"]}
    return out


def convert_torch_transformer_predictor(state_dict, num_layers, num_heads):
    """Reference TransformerPredictor (predictor.py:20-44) — a stack of
    torch TransformerEncoderLayers — -> flax `models.predictor
    .TransformerPredictor` params."""
    sd = numpy_state_dict(state_dict)
    params = {}
    for i in range(num_layers):
        p = f"transformer_encoder.layers.{i}"
        params[f"attn{i}"] = _mha(sd, f"{p}.self_attn", num_heads)
        params[f"LayerNorm_{2 * i}"] = _layernorm(sd, f"{p}.norm1")
        params[f"LayerNorm_{2 * i + 1}"] = _layernorm(sd, f"{p}.norm2")
        params[f"Dense_{2 * i}"] = _linear(sd, f"{p}.linear1")
        params[f"Dense_{2 * i + 1}"] = _linear(sd, f"{p}.linear2")
    return params


def convert_torch_mlp_predictor(state_dict, num_linear):
    """Reference ResidualMLPPredictor (predictor.py:47-73) -> flax
    `models.predictor.ResidualMLPPredictor` params."""
    sd = numpy_state_dict(state_dict)
    params = {"LayerNorm_0": _layernorm(sd, "ln")}
    for i in range(num_linear):
        params[f"Dense_{i}"] = _linear(sd, f"mlp.{2 * i}")
    return params


def convert_torch_rnn_predictor(state_dict, base_params, hidden_size,
                                rnn_num_layers=1):
    """Reference RNNPredictorWrapper (predictor.py:76-135): base predictor
    -> torch nn.LSTM -> out projection, onto flax
    `models.predictor.RNNPredictorWrapper` params.

    torch packs LSTM gates as rows (i|f|g|o) of weight_ih/weight_hh with
    two bias vectors; flax OptimizedLSTMCell keeps per-gate dense blocks
    (ii/if/ig/io input kernels without bias, hi/hf/hg/ho hidden kernels
    whose bias carries the SUM of torch's bias_ih + bias_hh — identical
    affine map).

    Args:
        state_dict: the wrapper's subtree ('base_predictor.*', 'rnn.*',
            'out_projector.*').
        base_params: the already-converted base predictor tree.
        hidden_size: LSTM hidden width (the reference wires slot_mlp_size,
            savi.py:340-343).
    """
    sd = numpy_state_dict(state_dict)
    H = hidden_size
    params = {"base": base_params,
              "out_proj": _linear(sd, "out_projector")}
    for layer in range(rnn_num_layers):
        wi = sd[f"rnn.weight_ih_l{layer}"]   # [4H, in]
        wh = sd[f"rnn.weight_hh_l{layer}"]   # [4H, H]
        bi = sd[f"rnn.bias_ih_l{layer}"]
        bh = sd[f"rnn.bias_hh_l{layer}"]
        cell = {}
        for gi, g in enumerate(("i", "f", "g", "o")):
            sl = slice(gi * H, (gi + 1) * H)
            cell[f"i{g}"] = {"kernel": np.transpose(wi[sl])}
            cell[f"h{g}"] = {"kernel": np.transpose(wh[sl]),
                             "bias": bi[sl] + bh[sl]}
        params[f"lstm{layer}"] = cell
    return params


def convert_torch_quantizer(state_dict):
    """Reference VectorQuantizer2 (vqvae/quantize.py:11-140) -> flax
    quantizer params: the [n_e, e_dim] codebook."""
    sd = numpy_state_dict(state_dict)
    return {"embedding": sd["embedding.weight"]}


def _convnb(sd, prefix):
    return {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}


def _gn_wrapped(sd, prefix):
    return {"GroupNorm_0": {"scale": sd[f"{prefix}.weight"],
                            "bias": sd[f"{prefix}.bias"]}}


def convert_torch_resnet(state_dict, stage_sizes, use_layer4=True):
    """Reference GN-ResNet18/34 (video_based/models/resnet.py:150-346) ->
    flax `models.resnet.ResNet` params. Bias-free convs, GroupNorm(32)
    with affine, optional 1x1 downsample branch per first stage block."""
    sd = numpy_state_dict(state_dict)
    params = {"Conv_0": _convnb(sd, "conv1"), "_GN_0": _gn_wrapped(sd, "bn1")}
    bidx = 0
    for stage in range(4 if use_layer4 else 3):
        for i in range(stage_sizes[stage]):
            p = f"layer{stage + 1}.{i}"
            blk = {
                "Conv_0": _convnb(sd, f"{p}.conv1"),
                "_GN_0": _gn_wrapped(sd, f"{p}.bn1"),
                "Conv_1": _convnb(sd, f"{p}.conv2"),
                "_GN_1": _gn_wrapped(sd, f"{p}.bn2"),
            }
            if f"{p}.downsample.0.weight" in sd:
                blk["Conv_2"] = _convnb(sd, f"{p}.downsample.0")
                blk["_GN_2"] = _gn_wrapped(sd, f"{p}.downsample.1")
            params[f"BasicBlock_{bidx}"] = blk
            bidx += 1
    return params


def _conv2d_block(sd, p):
    """Reference steve_utils.Conv2dBlock (steve_utils.py:95-119): bias-free
    conv `m` + external GN(1) affine params living on the block itself."""
    return {"Conv_0": _convnb(sd, f"{p}.m"),
            "GroupNorm_0": {"scale": sd[f"{p}.weight"],
                            "bias": sd[f"{p}.bias"]}}


def convert_torch_dvae(state_dict):
    """Reference dVAE (steve/dVAE.py:9-155, img twin slate/dVAE.py) ->
    flax `models.dvae.DVAE` params. Sequential indices: encoder 0-6 are
    Conv2dBlocks, 7 the logits conv; decoder 0-4 blocks, 5 PixelShuffle,
    6-9 blocks, 10 PixelShuffle, 11 the output conv."""
    sd = numpy_state_dict(state_dict)
    params = {}
    for i in range(7):
        params[f"enc_blocks_{i}"] = _conv2d_block(sd, f"encoder.{i}")
    params["enc_out"] = _conv(sd, "encoder.7")
    for i in range(5):
        params[f"dec_blocks1_{i}"] = _conv2d_block(sd, f"decoder.{i}")
    for i in range(4):
        params[f"dec_blocks2_{i}"] = _conv2d_block(sd, f"decoder.{i + 6}")
    params["dec_out"] = _conv(sd, "decoder.11")
    return params


def convert_torch_slot_rollouter(state_dict, num_layers, num_heads):
    """Reference SlotRollouter (vp_vqa/models/slotformer.py:46-135) ->
    flax `models.slotformer.SlotRollouter` params. The sine temporal PE is
    a frozen buffer on the torch side and recomputed on the flax side, so
    it is not converted."""
    sd = numpy_state_dict(state_dict)
    step = {"in_proj": _linear(sd, "in_proj"),
            "out_proj": _linear(sd, "out_proj")}
    for i in range(num_layers):
        p = f"transformer_encoder.layers.{i}"
        step[f"layer{i}"] = {
            "attn": _mha(sd, f"{p}.self_attn", num_heads),
            "LayerNorm_0": _layernorm(sd, f"{p}.norm1"),
            "LayerNorm_1": _layernorm(sd, f"{p}.norm2"),
            "Dense_0": _linear(sd, f"{p}.linear1"),
            "Dense_1": _linear(sd, f"{p}.linear2"),
        }
    return {"step": step}


def convert_torch_physion_readout(state_dict):
    """Reference PhysionReadout (vp_vqa/models/readout.py:12-109) -> flax
    `models.readout.PhysionReadout` params (two linears; the pair-index
    buffer is recomputed)."""
    sd = numpy_state_dict(state_dict)
    return {"linear1": _linear(sd, "linear1"),
            "linear2": _linear(sd, "linear2")}


def convert_torch_steve_transformer(state_dict, num_layers):
    """Reference STEVETransformerDecoder / SLATETransformerDecoder
    (steve_transformer.py:245-334) -> flax `models.ar_decoder
    .STEVETransformerDecoder` params."""
    sd = numpy_state_dict(state_dict)

    def attn(p):
        return {k: _linear(sd, f"{p}.proj_{k[5:]}", bias=False)
                for k in ("proj_q", "proj_k", "proj_v", "proj_o")}

    params = {
        "in_proj": _linear(sd, "in_proj"),
        "tok_emb": {"embedding": sd["tok_emb.weight"]},
        "pos_emb": sd["pos_emb.pe"],
        "final_ln": _layernorm(sd, "tf_dec.layer_norm"),
        "head": _linear(sd, "head", bias=False),
    }
    for i in range(num_layers):
        p = f"tf_dec.blocks.{i}"
        params[f"block{i}"] = {
            "self_attn_ln": _layernorm(sd, f"{p}.self_attn_layer_norm"),
            "self_attn": attn(f"{p}.self_attn"),
            "cross_ln": _layernorm(
                sd, f"{p}.encoder_decoder_attn_layer_norm"),
            "cross_attn": attn(f"{p}.encoder_decoder_attn"),
            "ffn_ln": _layernorm(sd, f"{p}.ffn_layer_norm"),
            "ffn_fc1": _linear(sd, f"{p}.ffn.0"),
            "ffn_fc2": _linear(sd, f"{p}.ffn.2"),
        }
    return params


def _vq_resblock(sd, p):
    """Reference vqvae ResnetBlock (modules.py:54-113) -> flax subtree."""
    out = {
        "GroupNorm32_0": _norm(sd, f"{p}.norm1"),
        "Conv_0": _conv(sd, f"{p}.conv1"),
        "GroupNorm32_1": _norm(sd, f"{p}.norm2"),
        "Conv_1": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["Conv_2"] = _conv(sd, f"{p}.nin_shortcut")
    elif f"{p}.conv_shortcut.weight" in sd:
        out["Conv_2"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _vq_attnblock(sd, p):
    """Reference vqvae AttnBlock (modules.py:113-165): q/k/v/proj_out 1x1
    convs, called in that order in the flax module."""
    return {
        "GroupNorm32_0": _norm(sd, f"{p}.norm"),
        "Conv_0": _conv(sd, f"{p}.q"),
        "Conv_1": _conv(sd, f"{p}.k"),
        "Conv_2": _conv(sd, f"{p}.v"),
        "Conv_3": _conv(sd, f"{p}.proj_out"),
    }


def convert_torch_vqvae(state_dict, enc_dec_dict):
    """Reference VQVAE (vqvae/VQVAE.py:40-152 over modules.py) -> flax
    `models.vqvae.VQVAE` params. Walks the same level/block bookkeeping as
    the reference ctors (modules.py:168-260, 262-340); mid attention is
    unconditional ('vanilla' make_attn), per-level attention follows
    attn_resolutions at the running resolution."""
    sd = numpy_state_dict(state_dict)
    ch_mult = list(enc_dec_dict["ch_mult"])
    nrb = enc_dec_dict["num_res_blocks"]
    attn_res = set(enc_dec_dict.get("attn_resolutions", ()))
    res = enc_dec_dict["resolution"]
    vanilla = enc_dec_dict.get("attn_type", "vanilla") == "vanilla"

    enc = {"conv_in": _conv(sd, "encoder.conv_in"),
           "mid_res1": _vq_resblock(sd, "encoder.mid.block_1"),
           "mid_res2": _vq_resblock(sd, "encoder.mid.block_2"),
           "norm_out": _norm(sd, "encoder.norm_out"),
           "conv_out": _conv(sd, "encoder.conv_out")}
    if vanilla:
        enc["mid_attn"] = _vq_attnblock(sd, "encoder.mid.attn_1")
    cur = res
    for level in range(len(ch_mult)):
        for i in range(nrb):
            enc[f"down{level}_res{i}"] = _vq_resblock(
                sd, f"encoder.down.{level}.block.{i}")
            if vanilla and cur in attn_res:
                enc[f"down{level}_attn{i}"] = _vq_attnblock(
                    sd, f"encoder.down.{level}.attn.{i}")
        if level != len(ch_mult) - 1:
            enc[f"down{level}_ds"] = _conv(
                sd, f"encoder.down.{level}.downsample.conv")
            cur //= 2

    dec = {"conv_in": _conv(sd, "decoder.conv_in"),
           "mid_res1": _vq_resblock(sd, "decoder.mid.block_1"),
           "mid_res2": _vq_resblock(sd, "decoder.mid.block_2"),
           "norm_out": _norm(sd, "decoder.norm_out"),
           "conv_out": _conv(sd, "decoder.conv_out")}
    if vanilla:
        dec["mid_attn"] = _vq_attnblock(sd, "decoder.mid.attn_1")
    cur = res // 2 ** (len(ch_mult) - 1)
    for level in reversed(range(len(ch_mult))):
        for i in range(nrb + 1):
            dec[f"up{level}_res{i}"] = _vq_resblock(
                sd, f"decoder.up.{level}.block.{i}")
            if vanilla and cur in attn_res:
                dec[f"up{level}_attn{i}"] = _vq_attnblock(
                    sd, f"decoder.up.{level}.attn.{i}")
        if level != 0:
            dec[f"up{level}_us"] = _conv(
                sd, f"decoder.up.{level}.upsample.conv")
            cur *= 2

    return {
        "encoder": enc,
        "decoder": dec,
        "quantize": {"embedding": sd["quantize.embedding.weight"]},
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }

"""Convert checkpoints between the reference (torch .pth) and this
framework (orbax), both directions, driven by the SAME config file that
trains/evals the model.

    # reference -> here: load a published .pth, save an orbax ckpt dir
    python scripts/convert_checkpoint.py --params configs/X.py \
        --weight ref_model.pth --out checkpoint/X/ckpt_converted

    # here -> reference: export a TPU-trained orbax ckpt to a torch .pth
    python scripts/convert_checkpoint.py --params configs/X.py \
        --weight checkpoint/X/ckpt_last --out model_torch.pth --to_torch

The converter/exporter kwargs (encoder variant, predictor RNN wrapper,
UNet/VQ-VAE shapes) are derived from the config's nested dicts — the
same dicts the reference's ctors consume — so any config in `configs/`
dispatches correctly. Numeric parity of every mapping is locked by
tests/test_reference_parity.py and tests/test_torch_export.py.

Reference checkpoint conventions handled (VQVAE.py:168-173,
ldm_slotformer.py:124-129): a wrapping {'state_dict': ...} key, 'loss.'
LPIPS heads (dropped — eval-only), and 'module.' DDP prefixes.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _clean_torch_sd(sd):
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("loss."):
            continue  # frozen LPIPS/VGG eval head, not a model weight
        out[k] = v
    return out


def _enc_kwargs(params):
    enc = params.enc_dict
    return dict(
        enc_resnet=enc.get("resnet", "") or "",
        enc_use_layer4=enc.get("use_layer4", False),
        enc_dino=bool(enc.get("dino", False)),
        dino_small=enc.get("small_size", True),
    ), len(enc.get("enc_channels", (3,))) - 1


def _pred_kwargs(params):
    pred = params.pred_dict
    return dict(
        pred_num_layers=pred.get("pred_num_layers", 2),
        pred_num_heads=pred.get("pred_num_heads", 4),
        pred_rnn=pred.get("pred_rnn", False),
        rnn_hidden_size=params.slot_dict.get("slot_mlp_size", None),
    )


def _unet_kwargs(dec_dict):
    u = dec_dict["unet_dict"]
    return dict(
        num_res_blocks=u["num_res_blocks"],
        channel_mult=tuple(u["channel_mult"]),
        attention_resolutions=tuple(u["attention_resolutions"]),
        resblock_updown=u.get("resblock_updown", False),
        transformer_depth=u.get("transformer_depth", 1),
    )


def _vae_enc_dec(dec_dict):
    vd = dec_dict.get("vae_dict", None) or {}
    return vd.get("enc_dec_dict", None)


def _dispatch(params):
    """-> (convert_fn(sd) -> tree, export_fn(tree) -> sd)."""
    from slotdiffusion_tpu.models import torch_convert as tc
    from slotdiffusion_tpu.models import torch_export as te

    name = params.model
    if name in ("SA", "SAVi"):
        enc_kwargs, n_enc = _enc_kwargs(params)
        n_dec = len(params.dec_dict["dec_channels"]) - 1
        if name == "SA":
            return (lambda sd: tc.convert_torch_sa(
                        sd, n_enc, n_dec, **enc_kwargs),
                    lambda tr: te.export_torch_sa(
                        tr, n_enc, n_dec, **_strip_dino(enc_kwargs)))
        pk = _pred_kwargs(params)
        return (lambda sd: tc.convert_torch_savi(
                    sd, n_enc, n_dec, **pk, **enc_kwargs),
                lambda tr: te.export_torch_savi(
                    tr, n_enc, n_dec, **pk, **_strip_dino(enc_kwargs)))

    if name in ("SADiffusion", "SAViDiffusion"):
        enc_kwargs, n_enc = _enc_kwargs(params)
        uk = _unet_kwargs(params.dec_dict)
        ed = _vae_enc_dec(params.dec_dict)
        if name == "SADiffusion":
            return (lambda sd: tc.convert_torch_sa_diffusion(
                        sd, n_enc, enc_dec_dict=ed, **uk, **enc_kwargs),
                    lambda tr: te.export_torch_sa_diffusion(
                        tr, n_enc, enc_dec_dict=ed, **uk,
                        **_strip_dino(enc_kwargs)))
        pk = _pred_kwargs(params)
        return (lambda sd: tc.convert_torch_savi_diffusion(
                    sd, n_enc, enc_dec_dict=ed, **pk, **uk, **enc_kwargs),
                lambda tr: te.export_torch_savi_diffusion(
                    tr, n_enc, enc_dec_dict=ed, **pk, **uk,
                    **_strip_dino(enc_kwargs)))

    if name in ("SLATE", "STEVE"):
        enc_kwargs, n_enc = _enc_kwargs(params)
        n_layers = params.dec_dict["dec_num_layers"]
        if name == "SLATE":
            return (lambda sd: tc.convert_torch_slate(
                        sd, n_enc, n_layers, **enc_kwargs),
                    lambda tr: te.export_torch_slate(
                        tr, n_enc, n_layers, **_strip_dino(enc_kwargs)))
        pk = _pred_kwargs(params)
        return (lambda sd: tc.convert_torch_steve(
                    sd, n_enc, dec_num_layers=n_layers, **pk,
                    **enc_kwargs),
                lambda tr: te.export_torch_steve(
                    tr, n_enc, dec_num_layers=n_layers, **pk,
                    **_strip_dino(enc_kwargs)))

    if name == "VQVAE":
        ed = params.enc_dec_dict
        return (lambda sd: tc.convert_torch_vqvae(sd, ed),
                lambda tr: te.export_torch_vqvae(tr, ed))

    if name in ("DVAE", "dVAE"):
        return tc.convert_torch_dvae, te.export_torch_dvae

    if name in ("SlotFormer", "LDMSlotFormer"):
        rd = params.rollout_dict
        rk = dict(rollout_num_layers=rd.get("num_layers", 4),
                  rollout_num_heads=rd.get("num_heads", 8))
        if name == "LDMSlotFormer":
            uk = _unet_kwargs(params.dec_dict)
            ed = _vae_enc_dec(params.dec_dict)
            return (lambda sd: tc.convert_torch_ldm_slotformer(
                        sd, ed, **rk, **uk),
                    lambda tr: te.export_torch_ldm_slotformer(
                        tr, ed, **rk, **uk))
        return (lambda sd: {"rollouter": tc.convert_torch_slot_rollouter(
                    {k[len("rollouter."):]: v for k, v in sd.items()
                     if k.startswith("rollouter.")},
                    num_layers=rk["rollout_num_layers"],
                    num_heads=rk["rollout_num_heads"])},
                lambda tr: {f"rollouter.{k}": v
                            for k, v in te.export_torch_slot_rollouter(
                                tr["rollouter"],
                                num_layers=rk["rollout_num_layers"],
                                num_heads=rk["rollout_num_heads"]).items()})

    if name == "PhysionReadout":
        return (tc.convert_torch_physion_readout,
                te.export_torch_physion_readout)

    raise ValueError(f"no converter dispatch for model {name!r}")


def _strip_dino(enc_kwargs):
    # exporters don't emit DINO subtrees (public frozen weights); they
    # also don't take the dino flags
    return {k: v for k, v in enc_kwargs.items()
            if k in ("enc_resnet", "enc_use_layer4")}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--params", required=True, help="config .py")
    parser.add_argument("--weight", required=True,
                        help="source: torch .pth (default) or orbax dir "
                             "(--to_torch)")
    parser.add_argument("--out", required=True,
                        help="destination: orbax dir (default) or .pth "
                             "(--to_torch)")
    parser.add_argument("--to_torch", action="store_true",
                        help="export orbax -> torch instead")
    parser.add_argument("--use_ema", action="store_true",
                        help="with --to_torch: export the EMA shadow")
    args = parser.parse_args()

    from slotdiffusion_tpu.utils import load_params
    params = load_params(args.params)
    convert_fn, export_fn = _dispatch(params)

    if args.to_torch:
        import numpy as np
        import torch

        from slotdiffusion_tpu.training.checkpoint import load_train_state
        raw = load_train_state(args.weight)
        tree = raw["params"] if "params" in raw else raw
        if args.use_ema and raw.get("ema", {}).get("shadow") is not None:
            tree = raw["ema"]["shadow"]
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in export_fn(tree).items()}
        torch.save({"state_dict": sd}, args.out)
        print(f"exported {len(sd)} tensors -> {args.out}")
    else:
        import torch

        import jax
        import orbax.checkpoint as ocp

        sd = _clean_torch_sd(
            torch.load(args.weight, map_location="cpu",
                       weights_only=True))
        tree = convert_fn(sd)
        n = len(jax.tree_util.tree_leaves(tree))
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(args.out), {"params": tree}, force=True)
        print(f"converted {n} arrays -> {args.out}")


if __name__ == "__main__":
    main()

"""scripts/convert_checkpoint.py: the user-facing checkpoint interop CLI.

A reference-layout torch .pth (built from the actual reference SA module
at the synthetic config's dims, wrapped in {'state_dict': ...} with
'loss.' noise keys like published checkpoints) must convert into an
orbax dir that `build_model(params)` + `load_model_params` can run —
and export back to a .pth bit-identical to the original weights.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_loader import ref_img_import

pytestmark = pytest.mark.fast

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def _run_cli(argv, monkeypatch):
    import convert_checkpoint
    monkeypatch.setattr(sys, "argv", ["convert_checkpoint.py"] + argv)
    convert_checkpoint.main()


def test_convert_checkpoint_cli_roundtrip(tmp_path, monkeypatch):
    from slotdiffusion_tpu.utils import load_params
    cfg_path = "configs/sa_synthetic_params-res64.py"
    params = load_params(cfg_path)

    ref_sa = ref_img_import("slot_attention")
    torch.manual_seed(31)
    tm = ref_sa.SA(resolution=tuple(params.resolution),
                   slot_dict=dict(params.slot_dict),
                   enc_dict=dict(params.enc_dict),
                   dec_dict=dict(params.dec_dict),
                   loss_dict=dict(use_img_recon_loss=True))
    sd = tm.state_dict()
    pth = str(tmp_path / "ref_sa.pth")
    torch.save({"state_dict": dict(sd, **{
        "loss.vgg.dummy": torch.zeros(3)}),  # published-ckpt noise key
    }, pth)

    out_dir = str(tmp_path / "ckpt_converted")
    _run_cli(["--params", cfg_path, "--weight", pth, "--out", out_dir],
             monkeypatch)
    assert os.path.isdir(out_dir)

    # the converted checkpoint loads into the framework model and runs
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    model = build_model(params)
    variables = load_model_params(model, out_dir)
    rng = np.random.RandomState(32)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    out = model.apply(variables, {"img": jnp.asarray(x)}, train=False)
    assert out["slots"].shape == (1, params.slot_dict["num_slots"],
                                  params.slot_dict["slot_size"])
    # and matches the torch forward
    with torch.no_grad():
        ref_slots = tm({"img": torch.tensor(
            np.transpose(x, (0, 3, 1, 2)))})["slots"].numpy()
    np.testing.assert_allclose(np.asarray(out["slots"]), ref_slots,
                               rtol=5e-4, atol=5e-5)

    # export back: bit-identical to the original torch weights
    pth2 = str(tmp_path / "back.pth")
    _run_cli(["--params", cfg_path, "--weight", out_dir, "--out", pth2,
              "--to_torch"], monkeypatch)
    back = torch.load(pth2, map_location="cpu",
                      weights_only=True)["state_dict"]
    for k, v in back.items():
        np.testing.assert_array_equal(v.numpy(), sd[k].numpy(),
                                      err_msg=k)
    trainable = {n for n, p in tm.named_parameters() if p.requires_grad}
    assert not trainable - set(back)


def test_convert_checkpoint_cli_savi_ldm(tmp_path, monkeypatch):
    """The flagship savi_ldm dispatch path: LDM decoder with its embedded
    frozen VQ-VAE (enc_dec_dict branch) plus the transformer predictor —
    all kwargs derived from the shipped config."""
    from reference_loader import ref_import
    from slotdiffusion_tpu.utils import load_params
    cfg_path = "configs/savi_ldm_synthetic_params-res64.py"
    params = load_params(cfg_path)

    ref_svd = ref_import("savi_diffusion")
    import copy
    torch.manual_seed(41)
    dec = copy.deepcopy(dict(params.dec_dict))
    # the config points vqvae_ckp_path at an orbax DIR for this
    # framework's grafting; the torch ctor would torch.load it
    dec["vae_dict"]["vqvae_ckp_path"] = ""
    tm = ref_svd.SAViDiffusion(
        resolution=tuple(params.resolution),
        clip_len=params.get("clip_len", params.get("n_sample_frames", 6)),
        slot_dict=copy.deepcopy(dict(params.slot_dict)),
        enc_dict=copy.deepcopy(dict(params.enc_dict)),
        dec_dict=dec,
        pred_dict=copy.deepcopy(dict(params.pred_dict)),
        loss_dict=dict(use_denoise_loss=True))
    tm.eval()  # torch dropout (predictor FFN) is active in train mode
    sd = {k: v for k, v in tm.state_dict().items()
          if not k.startswith("dm_decoder.model_ema")
          and ".dino." not in k}
    pth = str(tmp_path / "ref_savi_ldm.pth")
    torch.save({"state_dict": sd}, pth)

    out_dir = str(tmp_path / "ckpt_converted")
    _run_cli(["--params", cfg_path, "--weight", pth, "--out", out_dir],
             monkeypatch)

    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    model = build_model(params)
    variables = load_model_params(model, out_dir, use_ema=False)
    rng = np.random.RandomState(42)
    x = rng.rand(1, 2, 64, 64, 3).astype(np.float32)
    out = model.apply(variables, {"img": jnp.asarray(x)}, train=False,
                      rngs={"diffusion": jax.random.PRNGKey(0)})
    with torch.no_grad():
        ref_out = tm({"img": torch.tensor(
            np.transpose(x, (0, 1, 4, 2, 3)))})
    np.testing.assert_allclose(np.asarray(out["slots"]),
                               ref_out["slots"].numpy(), rtol=5e-4,
                               atol=5e-5)

    pth2 = str(tmp_path / "back.pth")
    _run_cli(["--params", cfg_path, "--weight", out_dir, "--out", pth2,
              "--to_torch"], monkeypatch)
    back = torch.load(pth2, map_location="cpu",
                      weights_only=True)["state_dict"]
    for k, v in back.items():
        np.testing.assert_array_equal(v.numpy(), sd[k].numpy(), err_msg=k)

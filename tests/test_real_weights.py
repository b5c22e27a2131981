"""Real-pretrained-weight parity (the weight-drop rehearsal's --verify leg).

These tests only run when actual upstream weight files have been dropped
into `$SLOTDIFFUSION_WEIGHTS_DROP` (see scripts/fetch_weights.py for the
exact filenames + URLs). Each test converts the REAL state dict with the
production converter, loads it into this repo's torch replica of the
upstream network (the same replicas the always-on parity tests use with
random weights), and asserts the JAX graph matches the torch forward — so
a future environment with egress goes from file drop to verified parity in
one command:

    python scripts/fetch_weights.py --src_dir <drop> --verify

In this zero-egress image every test here SKIPS (cleanly, not xfail).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_DROP = os.environ.get("SLOTDIFFUSION_WEIGHTS_DROP", "")


def _need(*names):
    if not _DROP:
        pytest.skip("no SLOTDIFFUSION_WEIGHTS_DROP directory set")
    paths = [os.path.join(_DROP, n) for n in names]
    missing = [p for p in paths if not os.path.isfile(p)]
    if missing:
        pytest.skip(f"weight files not dropped: {missing}")
    return paths if len(paths) > 1 else paths[0]


def test_real_lpips_vgg16_matches_torch(tmp_path, monkeypatch):
    """Real torchvision VGG16 + real LPIPS v0.1 linear heads through
    convert_torch_lpips_npz vs the torch lpips formula on the replica."""
    vgg_path, lin_path = _need("vgg16-397923af.pth", "vgg.pth")
    import torch
    import torch.nn.functional as F
    from test_pretrained_weights import _torchvision_vgg16_features

    from slotdiffusion_tpu.ops import lpips as lpips_mod

    out_npz = str(tmp_path / "lpips_real.npz")
    lpips_mod.convert_torch_lpips_npz(vgg_path, lin_path, out_npz)
    monkeypatch.setenv(lpips_mod.WEIGHTS_ENV, out_npz)
    lpips_mod._load_weights.cache_clear()

    vgg = _torchvision_vgg16_features()
    full_sd = torch.load(vgg_path, map_location="cpu")
    feat_sd = {k[len("features."):]: v for k, v in full_sd.items()
               if k.startswith("features.")}
    vgg.load_state_dict(feat_sd)
    lp_sd = torch.load(lin_path, map_location="cpu")

    rng = np.random.RandomState(2)
    x = rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    y = rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    tap_after = {3, 8, 15, 22, 29}

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
        for j, (f1, f2) in enumerate(zip(fx, fy)):
            n1 = f1 / (f1.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            n2 = f2 / (f2.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            w = lp_sd[f"lin{j}.model.1.weight"]
            ref += F.conv2d((n1 - n2) ** 2, w).mean(dim=(1, 2, 3))

    ours = np.asarray(lpips_mod.lpips_distance(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(y, (0, 2, 3, 1)))))
    lpips_mod._load_weights.cache_clear()
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=1e-5)


def test_real_dino_vits8_matches_hf(tmp_path, monkeypatch):
    """Real facebook/dino-vits8 weights through convert_hf_dino_npz vs the
    HF ViTModel forward with the same weights loaded."""
    bin_path = _need("dino_vits8.bin")
    transformers = pytest.importorskip("transformers")
    import torch

    from slotdiffusion_tpu.models.dino import (DINOEncoder, WEIGHTS_ENV,
                                               convert_hf_dino_npz,
                                               load_dino_weights)

    sd = torch.load(bin_path, map_location="cpu")
    cfg = transformers.ViTConfig(
        hidden_size=384, num_hidden_layers=12, num_attention_heads=6,
        intermediate_size=1536, image_size=224, patch_size=8,
        layer_norm_eps=1e-6, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    hf = transformers.ViTModel(cfg, add_pooling_layer=False)
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not missing, f"HF replica missing keys: {missing[:5]}"
    hf.eval()

    npz = str(tmp_path / "dino_real.npz")
    convert_hf_dino_npz(sd, npz, num_heads=6, depth=12)

    rng = np.random.RandomState(1)
    img = rng.rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(img)).last_hidden_state
    ref_patches = ref[:, 1:].numpy().reshape(2, 28, 28, 384)

    enc = DINOEncoder(patch_size=8, small_size=True)
    img_j = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    variables = enc.init(jax.random.PRNGKey(0), img_j)
    monkeypatch.setenv(WEIGHTS_ENV, npz)
    params, loaded = load_dino_weights(variables["params"])
    assert loaded
    ours = np.asarray(enc.apply({"params": params}, img_j))
    np.testing.assert_allclose(ours, ref_patches, rtol=2e-3, atol=2e-4)


def test_real_inception_fid_matches_torch(tmp_path, monkeypatch):
    """Real pytorch-fid InceptionV3 weights through
    convert_torch_inception_npz vs the Inception3-layout torch replica."""
    pth = _need("pt_inception-2015-12-05-6726825d.pth")
    import torch
    from test_fid import _build_torch_inception

    from slotdiffusion_tpu.ops import fid as fid_mod

    npz = str(tmp_path / "inception_real.npz")
    fid_mod.convert_torch_inception_npz(pth, npz)
    monkeypatch.setenv(fid_mod.WEIGHTS_ENV, npz)
    fid_mod._load_weights.cache_clear()

    net = _build_torch_inception()
    sd = torch.load(pth, map_location="cpu")
    missing, _unexpected = net.load_state_dict(sd, strict=False)
    assert not missing, f"inception replica missing keys: {missing[:5]}"
    net.eval()

    rng = np.random.RandomState(7)
    x01 = rng.rand(2, 299, 299, 3).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(
            x01.transpose(0, 3, 1, 2)) * 2.0 - 1.0).numpy()
    got = np.asarray(fid_mod.inception_pool3_features(jnp.asarray(x01)))
    fid_mod._load_weights.cache_clear()
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * max(scale, 1.0),
                               rtol=2e-3)


def test_real_i3d_fvd_matches_torch(tmp_path, monkeypatch):
    """Real pytorch-i3d rgb_imagenet weights through convert_torch_i3d_npz
    vs the InceptionI3d-layout torch replica."""
    pt = _need("rgb_imagenet.pt")
    import torch
    from test_fvd import _build_torch_i3d

    from slotdiffusion_tpu.ops import fvd as fvd_mod

    npz = str(tmp_path / "i3d_real.npz")
    fvd_mod.convert_torch_i3d_npz(pt, npz)
    monkeypatch.setenv(fvd_mod.WEIGHTS_ENV, npz)
    fvd_mod._load_weights.cache_clear()

    net = _build_torch_i3d()
    sd = torch.load(pt, map_location="cpu")
    missing, _unexpected = net.load_state_dict(sd, strict=False)
    assert not missing, f"i3d replica missing keys: {missing[:5]}"
    net.eval()

    rng = np.random.RandomState(3)
    x01 = rng.rand(1, 16, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(
            x01.transpose(0, 4, 1, 2, 3)) * 2.0 - 1.0).numpy()
    got = np.asarray(fvd_mod.i3d_features(jnp.asarray(x01)))
    fvd_mod._load_weights.cache_clear()
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * max(scale, 1.0),
                               rtol=2e-3)

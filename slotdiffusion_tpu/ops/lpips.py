"""LPIPS perceptual distance (VGG16 backbone) in JAX.

The reference uses the `lpips` pip package for the VQ-VAE perceptual loss
(video_based/models/vqvae/loss.py:8-46) and eval LPIPS distance
(eval_utils.py:109-111). This is a from-scratch JAX implementation of the
same computation: ImageNet-normalized inputs -> VGG16 conv features at the 5
standard taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3) ->
unit-normalize channels -> per-layer 1x1 linear weights -> spatial mean ->
sum over layers.

Pretrained weights cannot be downloaded in this environment (zero egress).
Weight loading:
- set `SLOTDIFFUSION_LPIPS_WEIGHTS` to a .npz with arrays `conv{i}_w`,
  `conv{i}_b` (VGG16 convs, OIHW or HWIO) and `lin{j}_w` (LPIPS heads), or
- place a torchvision VGG16 + lpips state dict and convert with
  `convert_torch_lpips_npz`.

Until weights are present, `lpips_available()` is False and callers skip the
perceptual term (training still works: L1 + quant loss).
"""

import os
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: conv channels per block (13 convs), taps after the
# last conv of each block (pre-pool ReLU outputs)
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_TAPS = (1, 3, 6, 9, 12)  # conv indices (0-based) whose relu output is used
_IMAGENET_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_IMAGENET_STD = np.array([0.458, 0.448, 0.450], np.float32)

WEIGHTS_ENV = "SLOTDIFFUSION_LPIPS_WEIGHTS"


def _weights_path():
    return os.environ.get(WEIGHTS_ENV, "")


def lpips_available():
    return os.path.isfile(_weights_path())


from ._provenance import file_sha256 as _file_sha256  # noqa: E402


def weights_label(name):
    """Provenance label (see ops/_provenance.py). Pinned prefix = sha of
    the published torchvision VGG16 state dict (vgg16-397923af.pth)."""
    from ._provenance import weights_label as _wl
    return _wl(name, _weights_path(), pinned_sha_prefix="397923af")


@lru_cache(maxsize=1)
def _load_weights():
    data = np.load(_weights_path())
    convs, lins = [], []
    for i in range(13):
        w = data[f"conv{i}_w"]
        # accept OIHW (torch, [O, I, 3, 3]) or HWIO (jax, [3, 3, I, O]);
        # VGG16 convs are all 3x3
        if w.shape[2] == 3 and w.shape[3] == 3:  # OIHW
            w = w.transpose(2, 3, 1, 0)
        convs.append((jnp.asarray(w), jnp.asarray(data[f"conv{i}_b"])))
    for j in range(5):
        lw = data[f"lin{j}_w"].reshape(-1)
        lins.append(jnp.asarray(lw))
    return convs, lins


def _vgg_features(x, convs):
    """x: [B, H, W, 3] in LPIPS 'scaled' space. Returns tap features."""
    feats = []
    ci = 0
    h = x
    for spec in _VGG_CFG:
        if spec == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
            continue
        w, b = convs[ci]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        h = jax.nn.relu(h)
        if ci in _TAPS:
            feats.append(h)
        ci += 1
    return feats


def lpips_distance(x, y):
    """LPIPS(VGG) between images in [-1, 1], NHWC. Returns [B] distances."""
    convs, lins = _load_weights()
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    y = (y - _IMAGENET_MEAN) / _IMAGENET_STD
    fx = _vgg_features(x, convs)
    fy = _vgg_features(y, convs)
    total = 0.0
    for f1, f2, lw in zip(fx, fy, lins):
        # eps OUTSIDE the sqrt — the lpips package's normalize_tensor
        # computes feat / (||feat|| + 1e-10)
        n1 = f1 / (jnp.sqrt(jnp.sum(f1 ** 2, -1, keepdims=True)) + 1e-10)
        n2 = f2 / (jnp.sqrt(jnp.sum(f2 ** 2, -1, keepdims=True)) + 1e-10)
        diff = (n1 - n2) ** 2
        total = total + jnp.mean(
            jnp.sum(diff * lw[None, None, None, :], -1), axis=(1, 2))
    return total


def save_random_lpips_npz(out_path, seed=0):
    """Write a randomly-initialized VGG16+LPIPS npz in the loader layout.

    Zero-egress stand-in: lets the perceptual term be exercised end-to-end
    in training/eval (graph, gradients, loss weighting) before the real
    torchvision/lpips .pth files are available — swapping in real weights
    is then purely a file drop (`convert_torch_lpips_npz`). He-style conv
    scales keep activations/distances O(1) so the term trains stably.
    """
    rng = np.random.RandomState(seed)
    out = {}
    in_ch = 3
    ci = 0
    for spec in _VGG_CFG:
        if spec == "M":
            continue
        fan_in = in_ch * 9
        out[f"conv{ci}_w"] = rng.normal(
            0, np.sqrt(2.0 / fan_in), (spec, in_ch, 3, 3)).astype(np.float32)
        out[f"conv{ci}_b"] = np.zeros((spec,), np.float32)
        in_ch = spec
        ci += 1
    for j, tap in enumerate(_TAPS):
        ch = [c for c in _VGG_CFG if c != "M"][tap]
        out[f"lin{j}_w"] = rng.uniform(0, 2.0 / ch, (ch,)).astype(np.float32)
    np.savez(out_path, **out)
    return out_path


def convert_torch_lpips_npz(vgg_state_path, lpips_state_path, out_path):
    """Convert torchvision VGG16 + lpips-package linear weights to our npz.

    Host-side utility; requires the .pth files locally (not downloadable in
    this environment).
    """
    import torch

    vgg = torch.load(vgg_state_path, map_location="cpu")
    lp = torch.load(lpips_state_path, map_location="cpu")
    out = {}
    # numeric sort on the features index — torchvision keys are
    # features.0/.2/.5/.../.28 and LEXICOGRAPHIC sort would interleave
    # "features.10" before "features.2", scrambling the conv order
    conv_keys = [k for k in vgg.keys()
                 if k.startswith("features") and k.endswith(".weight")]
    conv_keys.sort(key=lambda k: int(k.split(".")[1]))
    for i, k in enumerate(conv_keys):
        out[f"conv{i}_w"] = vgg[k].numpy()
        out[f"conv{i}_b"] = vgg[k.replace("weight", "bias")].numpy()
    for j in range(5):
        key = f"lin{j}.model.1.weight"
        out[f"lin{j}_w"] = lp[key].numpy()
    out["__source_sha256__"] = _file_sha256(vgg_state_path)
    np.savez(out_path, **out)
    return out_path

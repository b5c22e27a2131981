"""Native JAX FVD (Frechet Video Distance) feature extractor.

The reference computes FVD by dumping frames and shelling out to
StyleGAN-V's external `fvd2048_16f` tool (docs/video_based.md:81-90).
This module computes the I3D features natively on the TPU: the
Kinetics-400 InceptionI3d (GoogLeNet/Inception-V1 inflated to 3D,
Carreira & Zisserman 2017) as a pure-function JAX graph with BatchNorm
folded into convs at conversion time. The Frechet distance and streaming
stats are shared with FID (`ops/fid.py`).

Protocol matches the standard FVD recipe:
- clips of 16 frames, resized to 224x224 (bilinear, no antialias),
  scaled to [-1, 1];
- features are the 400-d pre-softmax logits, averaged over time;
- FVD = Frechet distance between real/generated feature Gaussians.

All convs/pools use TF 'SAME' padding (asymmetric for even kernels /
strides) — jax.lax 'SAME' implements exactly those semantics, and the
parity test's torch replica reproduces them with explicit F.pad, the
same way the public pytorch-i3d port does.

Weight layout follows the pytorch-i3d port (`rgb_imagenet.pt`-style state
dicts: `<Block>.conv3d.weight`, `<Block>.bn.{weight,bias,running_*}`,
branch modules `b0/b1a/b1b/b2a/b2b/b3b`, final `logits` with bias and no
BN). Convert once with `convert_torch_i3d_npz` and point
`SLOTDIFFUSION_I3D_WEIGHTS` at the npz; until then `i3d_available()` is
False and callers fall back to frame dumps for external tools (zero
egress here).
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .fid import FeatureStats, frechet_distance  # noqa: F401  (re-export)

WEIGHTS_ENV = "SLOTDIFFUSION_I3D_WEIGHTS"

_BN_EPS = 1e-3  # pytorch-i3d BatchNorm3d eps


def _weights_path():
    return os.environ.get(WEIGHTS_ENV, "")


def i3d_available():
    return os.path.isfile(_weights_path())


from ._provenance import file_sha256 as _file_sha256  # noqa: E402


def weights_label(name):
    """Provenance label (see ops/_provenance.py). pinned_sha_prefix=None:
    the upstream StyleGAN-V I3D torchscript file publishes no hash, so a
    converted source is accepted as-is (still auditable via [src=...])."""
    from ._provenance import weights_label as _wl
    return _wl(name, _weights_path(), pinned_sha_prefix=None)


# ---------------------------------------------------------------------------
# Architecture spec. Inception-V1 module channel lists are
# [b0, b1a, b1b, b2a, b2b, b3b] outputs; kernels per the inflated arch.
# ---------------------------------------------------------------------------

_MIXED = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}

#   path -> (kernel (kt, kh, kw), stride (st, sh, sw))
_CONVS = {
    "Conv3d_1a_7x7": ((7, 7, 7), (2, 2, 2)),
    "Conv3d_2b_1x1": ((1, 1, 1), (1, 1, 1)),
    "Conv3d_2c_3x3": ((3, 3, 3), (1, 1, 1)),
    "logits": ((1, 1, 1), (1, 1, 1)),
}
for _name in _MIXED:
    _CONVS[f"{_name}.b0"] = ((1, 1, 1), (1, 1, 1))
    _CONVS[f"{_name}.b1a"] = ((1, 1, 1), (1, 1, 1))
    _CONVS[f"{_name}.b1b"] = ((3, 3, 3), (1, 1, 1))
    _CONVS[f"{_name}.b2a"] = ((1, 1, 1), (1, 1, 1))
    _CONVS[f"{_name}.b2b"] = ((3, 3, 3), (1, 1, 1))
    _CONVS[f"{_name}.b3b"] = ((1, 1, 1), (1, 1, 1))


@lru_cache(maxsize=1)
def _load_weights():
    data = np.load(_weights_path())
    params = {}
    for path in _CONVS:
        params[path] = (jnp.asarray(data[f"{path}_w"]),  # TDHWIO... see below
                        jnp.asarray(data[f"{path}_b"]))
    return params


def _conv(h, params, path, relu=True):
    """Unit3D: folded conv + bias (+ relu). h: [B, T, H, W, C]."""
    w, b = params[path]
    _, stride = _CONVS[path]
    h = jax.lax.conv_general_dilated(
        h, w, stride, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    return jax.nn.relu(h) if relu else h


def _max_pool(h, window, stride, padding="SAME"):
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, *window, 1), (1, *stride, 1), padding)


def _mixed(h, p, prefix):
    b0 = _conv(h, p, f"{prefix}.b0")
    b1 = _conv(_conv(h, p, f"{prefix}.b1a"), p, f"{prefix}.b1b")
    b2 = _conv(_conv(h, p, f"{prefix}.b2a"), p, f"{prefix}.b2b")
    b3 = _conv(_max_pool(h, (3, 3, 3), (1, 1, 1)), p, f"{prefix}.b3b")
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _i3d_logits(x, p):
    """x: [B, T, 224, 224, 3] in [-1, 1]. Returns [B, 400] time-averaged
    pre-softmax logits."""
    h = _conv(x, p, "Conv3d_1a_7x7")
    h = _max_pool(h, (1, 3, 3), (1, 2, 2))
    h = _conv(h, p, "Conv3d_2b_1x1")
    h = _conv(h, p, "Conv3d_2c_3x3")
    h = _max_pool(h, (1, 3, 3), (1, 2, 2))
    h = _mixed(h, p, "Mixed_3b")
    h = _mixed(h, p, "Mixed_3c")
    h = _max_pool(h, (3, 3, 3), (2, 2, 2))
    h = _mixed(h, p, "Mixed_4b")
    h = _mixed(h, p, "Mixed_4c")
    h = _mixed(h, p, "Mixed_4d")
    h = _mixed(h, p, "Mixed_4e")
    h = _mixed(h, p, "Mixed_4f")
    h = _max_pool(h, (2, 2, 2), (2, 2, 2))
    h = _mixed(h, p, "Mixed_5b")
    h = _mixed(h, p, "Mixed_5c")
    # VALID average pool over (2, 7, 7), stride 1 (pytorch-i3d forward)
    h = jax.lax.reduce_window(
        h, 0.0, jax.lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1),
        "VALID") / (2.0 * 7.0 * 7.0)
    h = _conv(h, p, "logits", relu=False)
    return jnp.mean(h, axis=(1, 2, 3))


def i3d_features(videos):
    """FVD features for videos in [0, 1], [B, T, H, W, 3], T >= 9.

    Resizes frames to 224x224 (bilinear half-pixel, antialias OFF) and
    maps to [-1, 1] before the network. Returns [B, 400] float32.
    """
    p = _load_weights()
    x = jnp.asarray(videos, jnp.float32)
    B, T = x.shape[:2]
    if x.shape[2:4] != (224, 224):
        x = jax.image.resize(
            x, (B, T, 224, 224, x.shape[4]), "bilinear", antialias=False)
    x = x * 2.0 - 1.0
    return _i3d_logits(x, p)


def fvd_from_features(feats1, feats2):
    """FVD between two raw feature arrays [N, 400] (host-side)."""
    s1, s2 = FeatureStats(feats1.shape[1]), FeatureStats(feats2.shape[1])
    s1.update(feats1)
    s2.update(feats2)
    return frechet_distance(*s1.finalize(), *s2.finalize())


def convert_torch_i3d_npz(state_path, out_path):
    """Fold a pytorch-i3d-layout `InceptionI3d` state dict into our npz.

    Every Unit3D except `logits` is a bias-free conv + BatchNorm3d
    (eps=1e-3): w' = w * gamma/sqrt(var+eps), b' = beta - mean *
    gamma/sqrt(var+eps). `logits` has a plain bias and no BN. Weights are
    stored DHWIO. Host-side utility; the .pt must be obtained outside
    this environment (zero egress).
    """
    import torch

    sd = torch.load(state_path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for path in _CONVS:
        w = sd[f"{path}.conv3d.weight"].numpy().astype(np.float64)  # OIDHW
        if f"{path}.bn.weight" in sd:
            gamma = sd[f"{path}.bn.weight"].numpy().astype(np.float64)
            beta = sd[f"{path}.bn.bias"].numpy().astype(np.float64)
            mean = sd[f"{path}.bn.running_mean"].numpy().astype(np.float64)
            var = sd[f"{path}.bn.running_var"].numpy().astype(np.float64)
            scale = gamma / np.sqrt(var + _BN_EPS)
            w = w * scale[:, None, None, None, None]
            b = beta - mean * scale
        else:  # logits: plain bias, no BN
            b = sd[f"{path}.conv3d.bias"].numpy().astype(np.float64)
        out[f"{path}_w"] = w.transpose(2, 3, 4, 1, 0).astype(np.float32)
        out[f"{path}_b"] = b.astype(np.float32)
    out["__source_sha256__"] = _file_sha256(state_path)
    np.savez(out_path, **out)
    return out_path

"""Native JAX FID (Frechet Inception Distance).

The reference computes FID/FVD by dumping frames and shelling out to the
external `pytorch-fid` tool (docs/img_based.md:82-84, docs/video_based.md:
81-90); this module computes FID natively on the TPU instead: an
InceptionV3 pool3 feature extractor (pure-function JAX graph, BatchNorm
folded into convs at conversion time), streaming (mu, sigma) accumulation,
and the host-side Frechet distance.

Protocol matches `pytorch-fid`:
- inputs are resized to 299x299 (bilinear, no antialias) and scaled to
  [-1, 1];
- the InceptionV3 is the torchvision architecture with the FID patches:
  every average-pool branch excludes padding from the divisor
  (count_include_pad=False) and Mixed_7c's pool branch uses MAX pooling;
- features are the 2048-d global-average pool3 activations;
- FID = |mu1-mu2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2)) with covariance over
  features (rows = samples, ddof=1) and an eps*I retry when sqrtm is
  singular.

Pretrained weights cannot be downloaded here (zero egress). Set
`SLOTDIFFUSION_INCEPTION_WEIGHTS` to an npz produced by
`convert_torch_inception_npz` from a torchvision-layout `Inception3` state
dict; until then `inception_available()` is False and callers fall back to
the reference behavior (frame dumps for external tools).
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_ENV = "SLOTDIFFUSION_INCEPTION_WEIGHTS"

_BN_EPS = 1e-3  # torchvision Inception3 BatchNorm eps


def _weights_path():
    return os.environ.get(WEIGHTS_ENV, "")


def inception_available():
    return os.path.isfile(_weights_path())


from ._provenance import file_sha256 as _file_sha256  # noqa: E402


def weights_label(name):
    """Provenance label (see ops/_provenance.py). Pinned prefix = the
    8-hex tag embedded in the published pt_inception filename."""
    from ._provenance import weights_label as _wl
    return _wl(name, _weights_path(), pinned_sha_prefix="6726825d")


# ---------------------------------------------------------------------------
# Architecture spec: every BasicConv2d (conv + BN + relu) in torchvision's
# Inception3, keyed by its state-dict module path. Shared by the converter
# and the forward graph so they cannot drift.
#   (path, kernel (kh, kw), stride, padding ((ph, pw) pairs))
# ---------------------------------------------------------------------------

def _a(prefix, pool_features):  # InceptionA (Mixed_5b/5c/5d)
    return [
        (f"{prefix}.branch1x1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch5x5_1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch5x5_2", (5, 5), 1, (2, 2)),
        (f"{prefix}.branch3x3dbl_1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3dbl_2", (3, 3), 1, (1, 1)),
        (f"{prefix}.branch3x3dbl_3", (3, 3), 1, (1, 1)),
        (f"{prefix}.branch_pool", (1, 1), 1, (0, 0)),
    ]


def _b(prefix):  # InceptionB (Mixed_6a)
    return [
        (f"{prefix}.branch3x3", (3, 3), 2, (0, 0)),
        (f"{prefix}.branch3x3dbl_1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3dbl_2", (3, 3), 1, (1, 1)),
        (f"{prefix}.branch3x3dbl_3", (3, 3), 2, (0, 0)),
    ]


def _c(prefix):  # InceptionC (Mixed_6b..6e)
    return [
        (f"{prefix}.branch1x1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7_1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7_2", (1, 7), 1, (0, 3)),
        (f"{prefix}.branch7x7_3", (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7dbl_1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7dbl_2", (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7dbl_3", (1, 7), 1, (0, 3)),
        (f"{prefix}.branch7x7dbl_4", (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7dbl_5", (1, 7), 1, (0, 3)),
        (f"{prefix}.branch_pool", (1, 1), 1, (0, 0)),
    ]


def _d(prefix):  # InceptionD (Mixed_7a)
    return [
        (f"{prefix}.branch3x3_1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3_2", (3, 3), 2, (0, 0)),
        (f"{prefix}.branch7x7x3_1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7x3_2", (1, 7), 1, (0, 3)),
        (f"{prefix}.branch7x7x3_3", (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7x3_4", (3, 3), 2, (0, 0)),
    ]


def _e(prefix):  # InceptionE (Mixed_7b/7c)
    return [
        (f"{prefix}.branch1x1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3_1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3_2a", (1, 3), 1, (0, 1)),
        (f"{prefix}.branch3x3_2b", (3, 1), 1, (1, 0)),
        (f"{prefix}.branch3x3dbl_1", (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3dbl_2", (3, 3), 1, (1, 1)),
        (f"{prefix}.branch3x3dbl_3a", (1, 3), 1, (0, 1)),
        (f"{prefix}.branch3x3dbl_3b", (3, 1), 1, (1, 0)),
        (f"{prefix}.branch_pool", (1, 1), 1, (0, 0)),
    ]


_STEM = [
    ("Conv2d_1a_3x3", (3, 3), 2, (0, 0)),
    ("Conv2d_2a_3x3", (3, 3), 1, (0, 0)),
    ("Conv2d_2b_3x3", (3, 3), 1, (1, 1)),
    ("Conv2d_3b_1x1", (1, 1), 1, (0, 0)),
    ("Conv2d_4a_3x3", (3, 3), 1, (0, 0)),
]

_ALL_CONVS = (
    _STEM
    + _a("Mixed_5b", 32) + _a("Mixed_5c", 64) + _a("Mixed_5d", 64)
    + _b("Mixed_6a")
    + _c("Mixed_6b") + _c("Mixed_6c") + _c("Mixed_6d") + _c("Mixed_6e")
    + _d("Mixed_7a")
    + _e("Mixed_7b") + _e("Mixed_7c")
)

_CONV_SPEC = {path: (k, s, p) for path, k, s, p in _ALL_CONVS}


@lru_cache(maxsize=1)
def _load_weights():
    data = np.load(_weights_path())
    params = {}
    for path in _CONV_SPEC:
        w = np.asarray(data[f"{path}_w"])  # HWIO (converter output)
        b = np.asarray(data[f"{path}_b"])
        params[path] = (jnp.asarray(w), jnp.asarray(b))
    return params


def _conv(h, params, path):
    w, b = params[path]
    k, s, (ph, pw) = _CONV_SPEC[path]
    del k  # kernel size is implied by the weight shape
    h = jax.lax.conv_general_dilated(
        h, w, (s, s), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    return jax.nn.relu(h)


def _max_pool(h, window, stride, pad=0):
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avg_pool3_exclude_pad(h):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False — the
    pytorch-fid patch to every InceptionA/C/E pool branch."""
    s = jax.lax.reduce_window(
        h, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones(h.shape[1:3], h.dtype)[None, :, :, None]
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / count


def _inception_a(h, p, prefix):
    b1 = _conv(h, p, f"{prefix}.branch1x1")
    b5 = _conv(_conv(h, p, f"{prefix}.branch5x5_1"), p,
               f"{prefix}.branch5x5_2")
    b3 = _conv(_conv(_conv(h, p, f"{prefix}.branch3x3dbl_1"), p,
                     f"{prefix}.branch3x3dbl_2"), p,
               f"{prefix}.branch3x3dbl_3")
    bp = _conv(_avg_pool3_exclude_pad(h), p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(h, p, prefix):
    b3 = _conv(h, p, f"{prefix}.branch3x3")
    bd = _conv(_conv(_conv(h, p, f"{prefix}.branch3x3dbl_1"), p,
                     f"{prefix}.branch3x3dbl_2"), p,
               f"{prefix}.branch3x3dbl_3")
    bp = _max_pool(h, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(h, p, prefix):
    b1 = _conv(h, p, f"{prefix}.branch1x1")
    b7 = h
    for i in (1, 2, 3):
        b7 = _conv(b7, p, f"{prefix}.branch7x7_{i}")
    bd = h
    for i in (1, 2, 3, 4, 5):
        bd = _conv(bd, p, f"{prefix}.branch7x7dbl_{i}")
    bp = _conv(_avg_pool3_exclude_pad(h), p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(h, p, prefix):
    b3 = _conv(_conv(h, p, f"{prefix}.branch3x3_1"), p,
               f"{prefix}.branch3x3_2")
    b7 = h
    for i in (1, 2, 3, 4):
        b7 = _conv(b7, p, f"{prefix}.branch7x7x3_{i}")
    bp = _max_pool(h, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(h, p, prefix, pool="avg"):
    b1 = _conv(h, p, f"{prefix}.branch1x1")
    b3 = _conv(h, p, f"{prefix}.branch3x3_1")
    b3 = jnp.concatenate([_conv(b3, p, f"{prefix}.branch3x3_2a"),
                          _conv(b3, p, f"{prefix}.branch3x3_2b")], axis=-1)
    bd = _conv(_conv(h, p, f"{prefix}.branch3x3dbl_1"), p,
               f"{prefix}.branch3x3dbl_2")
    bd = jnp.concatenate([_conv(bd, p, f"{prefix}.branch3x3dbl_3a"),
                          _conv(bd, p, f"{prefix}.branch3x3dbl_3b")], axis=-1)
    if pool == "max":  # pytorch-fid's Mixed_7c patch
        bp = _max_pool(h, 3, 1, pad=1)
    else:
        bp = _avg_pool3_exclude_pad(h)
    bp = _conv(bp, p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _pool3_features(x, p):
    """x: [B, 299, 299, 3] in [-1, 1]. Returns [B, 2048]."""
    h = x
    h = _conv(h, p, "Conv2d_1a_3x3")
    h = _conv(h, p, "Conv2d_2a_3x3")
    h = _conv(h, p, "Conv2d_2b_3x3")
    h = _max_pool(h, 3, 2)
    h = _conv(h, p, "Conv2d_3b_1x1")
    h = _conv(h, p, "Conv2d_4a_3x3")
    h = _max_pool(h, 3, 2)
    h = _inception_a(h, p, "Mixed_5b")
    h = _inception_a(h, p, "Mixed_5c")
    h = _inception_a(h, p, "Mixed_5d")
    h = _inception_b(h, p, "Mixed_6a")
    h = _inception_c(h, p, "Mixed_6b")
    h = _inception_c(h, p, "Mixed_6c")
    h = _inception_c(h, p, "Mixed_6d")
    h = _inception_c(h, p, "Mixed_6e")
    h = _inception_d(h, p, "Mixed_7a")
    h = _inception_e(h, p, "Mixed_7b")
    h = _inception_e(h, p, "Mixed_7c", pool="max")
    return jnp.mean(h, axis=(1, 2))


def inception_pool3_features(images):
    """pool3 features for images in [0, 1], NHWC, any spatial size.

    Resizes to 299x299 (bilinear half-pixel, antialias OFF — matching
    pytorch-fid's F.interpolate(mode='bilinear', align_corners=False))
    and maps to [-1, 1] before the network. Returns [B, 2048] float32.
    """
    p = _load_weights()
    x = jnp.asarray(images, jnp.float32)
    if x.shape[1:3] != (299, 299):
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, x.shape[3]), "bilinear",
            antialias=False)
    x = x * 2.0 - 1.0
    return _pool3_features(x, p)


class FeatureStats:
    """Streaming (mu, sigma) accumulator for FID features.

    Accumulates sum and outer-product sum so evaluation stays resumable
    (mirrors the per-batch pkl cache pattern of test_recon,
    reference video_based/test_recon.py:74-88).
    """

    def __init__(self, dim=2048):
        self.n = 0
        self.s = np.zeros((dim,), np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats):
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.s += f.sum(0)
        self.outer += f.T @ f

    def state_dict(self):
        return {"n": self.n, "s": self.s, "outer": self.outer}

    def load_state_dict(self, d):
        self.n, self.s, self.outer = int(d["n"]), d["s"], d["outer"]

    def finalize(self):
        if self.n < 2:
            raise ValueError("need >= 2 samples for covariance")
        mu = self.s / self.n
        # unbiased covariance (ddof=1), matching np.cov(rowvar=False)
        sigma = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """d^2 = |mu1-mu2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2)).

    Host-side numpy/scipy (eval metric, not jitted). When sqrt(S1 S2) is
    singular/non-finite, retries with eps*I jitter on both covariances —
    the standard pytorch-fid fallback.
    """
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(feats1, feats2):
    """FID between two raw feature arrays [N, D] (host-side)."""
    s1, s2 = FeatureStats(feats1.shape[1]), FeatureStats(feats2.shape[1])
    s1.update(feats1)
    s2.update(feats2)
    return frechet_distance(*s1.finalize(), *s2.finalize())


def convert_torch_inception_npz(state_path, out_path):
    """Fold a torchvision-layout `Inception3` state dict into our npz.

    Each BasicConv2d (bias-free conv + BatchNorm eps=1e-3) folds to one
    conv with bias: w' = w * gamma/sqrt(var+eps), b' = beta - mean *
    gamma/sqrt(var+eps). Weights are stored HWIO. Host-side utility; the
    .pth must be obtained outside this environment (zero egress).
    """
    import torch

    sd = torch.load(state_path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for path in _CONV_SPEC:
        w = sd[f"{path}.conv.weight"].numpy().astype(np.float64)  # OIHW
        gamma = sd[f"{path}.bn.weight"].numpy().astype(np.float64)
        beta = sd[f"{path}.bn.bias"].numpy().astype(np.float64)
        mean = sd[f"{path}.bn.running_mean"].numpy().astype(np.float64)
        var = sd[f"{path}.bn.running_var"].numpy().astype(np.float64)
        scale = gamma / np.sqrt(var + _BN_EPS)
        w = w * scale[:, None, None, None]
        b = beta - mean * scale
        out[f"{path}_w"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        out[f"{path}_b"] = b.astype(np.float32)
    out["__source_sha256__"] = _file_sha256(state_path)
    np.savez(out_path, **out)
    return out_path

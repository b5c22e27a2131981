"""Native FID: Frechet math, streaming stats, and InceptionV3 graph parity.

The reference defers FID to the external `pytorch-fid` tool
(docs/img_based.md:82-84); ops/fid.py computes it natively. The graph
parity test constructs a torchvision-layout `Inception3` replica in torch
(random weights, eval mode, the pytorch-fid pooling patches), folds its
state dict with `convert_torch_inception_npz`, and requires our JAX graph
to reproduce its pool3 features — so a real torchvision checkpoint will
convert correctly when one is available (zero egress here).
"""

import numpy as np
import pytest

from slotdiffusion_tpu.ops import fid as fid_mod


# ---------------------------------------------------------------------------
# Frechet distance + streaming stats (fast tier)
# ---------------------------------------------------------------------------

@pytest.mark.fast
def test_frechet_identical_stats_is_zero(rng):
    mu = rng.randn(8)
    a = rng.randn(8, 8)
    sigma = a @ a.T + np.eye(8)
    d = fid_mod.frechet_distance(mu, sigma, mu, sigma)
    assert abs(d) < 1e-8


@pytest.mark.fast
def test_frechet_diagonal_analytic(rng):
    """For diagonal covariances the trace term is sum(a + b - 2 sqrt(ab))."""
    mu1, mu2 = rng.randn(6), rng.randn(6)
    a, b = rng.rand(6) + 0.5, rng.rand(6) + 0.5
    want = float(np.sum((mu1 - mu2) ** 2) + np.sum(a + b - 2 * np.sqrt(a * b)))
    got = fid_mod.frechet_distance(mu1, np.diag(a), mu2, np.diag(b))
    assert abs(got - want) < 1e-8


@pytest.mark.fast
def test_frechet_matches_eigendecomposition(rng):
    """Independent sqrtm: S1 S2 is diagonalizable with positive spectrum
    for SPD inputs; sqrt via eigendecomposition must agree with scipy."""
    def spd(n):
        a = rng.randn(n, n)
        return a @ a.T + n * np.eye(n)

    mu1, mu2 = rng.randn(5), rng.randn(5)
    s1, s2 = spd(5), spd(5)
    w, v = np.linalg.eig(s1 @ s2)
    sqrt_prod = (v * np.sqrt(w.astype(complex))) @ np.linalg.inv(v)
    want = float(np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
                 - 2.0 * np.trace(sqrt_prod).real)
    got = fid_mod.frechet_distance(mu1, s1, mu2, s2)
    assert abs(got - want) < 1e-6 * max(1.0, abs(want))


@pytest.mark.fast
def test_feature_stats_streaming_matches_direct(rng):
    feats = rng.randn(37, 12)
    st = fid_mod.FeatureStats(12)
    for chunk in np.array_split(feats, 5):
        st.update(chunk)
    mu, sigma = st.finalize()
    np.testing.assert_allclose(mu, feats.mean(0), atol=1e-12)
    np.testing.assert_allclose(sigma, np.cov(feats, rowvar=False),
                               atol=1e-10)
    # resumable: round-trip through state_dict
    st2 = fid_mod.FeatureStats(12)
    st2.load_state_dict(st.state_dict())
    mu2, sigma2 = st2.finalize()
    np.testing.assert_allclose(mu2, mu)
    np.testing.assert_allclose(sigma2, sigma)


@pytest.mark.fast
def test_fid_separates_distributions(rng):
    same_a = rng.randn(400, 4)
    same_b = rng.randn(400, 4)
    shifted = rng.randn(400, 4) + 3.0
    near = fid_mod.fid_from_features(same_a, same_b)
    far = fid_mod.fid_from_features(same_a, shifted)
    assert near < 1.0
    assert far > 20.0


@pytest.mark.fast
def test_avg_pool_excludes_padding():
    """count_include_pad=False semantics vs torch (the pytorch-fid patch)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import jax.numpy as jnp

    x = np.random.RandomState(1).rand(2, 7, 5, 3).astype(np.float32)
    ours = np.asarray(fid_mod._avg_pool3_exclude_pad(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.avg_pool2d(xt, 3, stride=1, padding=1,
                        count_include_pad=False)
    np.testing.assert_allclose(
        ours, want.numpy().transpose(0, 2, 3, 1), rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# InceptionV3 graph parity vs a torch replica (slow tier)
# ---------------------------------------------------------------------------

def _build_torch_inception():
    """torchvision-layout Inception3 with the pytorch-fid pooling patches.

    Layout (module paths, BasicConv2d = bias-free conv + BN eps=1e-3)
    follows the public torchvision architecture so the converter sees
    exactly the key names a real checkpoint has.
    """
    import torch
    from torch import nn
    import torch.nn.functional as F

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avgp(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1,
                            count_include_pad=False)

    class IncA(nn.Module):
        def __init__(self, cin, pf):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3,
                                              padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3,
                                              padding=1)
            self.branch_pool = BasicConv2d(cin, pf, kernel_size=1)

        def forward(self, x):
            import torch as t
            return t.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                self.branch_pool(avgp(x))], 1)

    class IncB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3,
                                              padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3,
                                              stride=2)

        def forward(self, x):
            import torch as t
            return t.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class IncC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                           padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                              padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                              padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                              padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                              padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            import torch as t
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(
                    self.branch7x7dbl_1(x)))))
            return t.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(avgp(x))], 1)

    class IncD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                             padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                             padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3,
                                             stride=2)

        def forward(self, x):
            import torch as t
            return t.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                    self.branch7x7x3_1(x)))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class IncE(nn.Module):
        def __init__(self, cin, max_pool=False):
            super().__init__()
            self.max_pool = max_pool
            self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3,
                                              padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                               padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                               padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            import torch as t
            b3 = self.branch3x3_1(x)
            b3 = t.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = t.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
            if self.max_pool:  # pytorch-fid's Mixed_7c patch
                bp = F.max_pool2d(x, 3, stride=1, padding=1)
            else:
                bp = avgp(x)
            return t.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)

    class Inception3(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3,
                                             padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = IncA(192, 32)
            self.Mixed_5c = IncA(256, 64)
            self.Mixed_5d = IncA(288, 64)
            self.Mixed_6a = IncB(288)
            self.Mixed_6b = IncC(768, 128)
            self.Mixed_6c = IncC(768, 160)
            self.Mixed_6d = IncC(768, 160)
            self.Mixed_6e = IncC(768, 192)
            self.Mixed_7a = IncD(768)
            self.Mixed_7b = IncE(1280)
            self.Mixed_7c = IncE(2048, max_pool=True)

        def forward(self, x):
            import torch as t
            h = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            h = F.max_pool2d(h, 3, stride=2)
            h = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(h))
            h = F.max_pool2d(h, 3, stride=2)
            for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                         "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                         "Mixed_7a", "Mixed_7b", "Mixed_7c"):
                h = getattr(self, name)(h)
            return t.mean(h, dim=(2, 3))

    net = Inception3()
    # keep activations O(1) through 94 random convs: small conv weights,
    # randomized (but sane) BN running stats so folding is exercised
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.normal_(0.0, 0.05, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return net.eval()


def test_inception_graph_matches_torch_replica(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    net = _build_torch_inception()
    sd_path = str(tmp_path / "inception.pth")
    torch.save(net.state_dict(), sd_path)
    npz_path = str(tmp_path / "inception.npz")
    fid_mod.convert_torch_inception_npz(sd_path, npz_path)

    monkeypatch.setenv(fid_mod.WEIGHTS_ENV, npz_path)
    fid_mod._load_weights.cache_clear()

    rng = np.random.RandomState(7)
    x01 = rng.rand(2, 299, 299, 3).astype(np.float32)  # [0,1] NHWC
    with torch.no_grad():
        want = net(torch.from_numpy(
            x01.transpose(0, 3, 1, 2)) * 2.0 - 1.0).numpy()
    got = np.asarray(fid_mod.inception_pool3_features(jnp.asarray(x01)))

    fid_mod._load_weights.cache_clear()
    assert got.shape == (2, 2048)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * max(scale, 1.0),
                               rtol=2e-3)

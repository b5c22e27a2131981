"""Native FVD: I3D graph parity vs a pytorch-i3d-layout torch replica.

The reference defers FVD to StyleGAN-V's external tool
(docs/video_based.md:81-90); ops/fvd.py computes the I3D features
natively. The replica below reproduces the public pytorch-i3d port's
layout (Unit3D = bias-free Conv3d + BatchNorm3d eps=1e-3, TF-'SAME'
asymmetric padding computed per input size) so a real `rgb_imagenet.pt`
state dict will convert correctly when one is available (zero egress).
"""

import numpy as np
import pytest

from slotdiffusion_tpu.ops import fvd as fvd_mod


@pytest.mark.fast
def test_fvd_from_features_separates(rng):
    a = rng.randn(300, 6)
    b = rng.randn(300, 6)
    c = rng.randn(300, 6) * 2.0 + 4.0
    assert fvd_mod.fvd_from_features(a, b) < 1.0
    assert fvd_mod.fvd_from_features(a, c) > 10.0


def _build_torch_i3d():
    import torch
    from torch import nn
    import torch.nn.functional as F

    def same_pad(x, kernel, stride):
        # TF 'SAME': per-dim total = max(k - (n % s or s), 0), split
        # front = total // 2 (asymmetric for even totals) — the same
        # computation the public pytorch-i3d port does with F.pad
        pads = []
        for dim, k, s in zip(x.shape[2:], kernel, stride):
            rem = dim % s
            total = max(k - (rem if rem else s), 0)
            pads.append((total // 2, total - total // 2))
        # F.pad takes last dim first: (w0, w1, h0, h1, t0, t1)
        flat = [v for p in reversed(pads) for v in p]
        return F.pad(x, flat)

    class Unit3D(nn.Module):
        def __init__(self, cin, cout, kernel=(1, 1, 1), stride=(1, 1, 1),
                     use_bn=True, use_bias=False, relu=True):
            super().__init__()
            self.kernel, self.stride, self.relu_ = kernel, stride, relu
            self.conv3d = nn.Conv3d(cin, cout, kernel, stride=stride,
                                    bias=use_bias)
            self.bn = nn.BatchNorm3d(cout, eps=0.001) if use_bn else None

        def forward(self, x):
            x = self.conv3d(same_pad(x, self.kernel, self.stride))
            if self.bn is not None:
                x = self.bn(x)
            return torch.relu(x) if self.relu_ else x

    class MaxPoolSame(nn.Module):
        def __init__(self, kernel, stride):
            super().__init__()
            self.kernel, self.stride = kernel, stride

        def forward(self, x):
            # zero-padding is equivalent to TF's -inf here: inputs are
            # post-ReLU (>= 0) at every pool site in this network
            return F.max_pool3d(same_pad(x, self.kernel, self.stride),
                                self.kernel, self.stride)

    class Mixed(nn.Module):
        def __init__(self, cin, ch):
            super().__init__()
            self.b0 = Unit3D(cin, ch[0])
            self.b1a = Unit3D(cin, ch[1])
            self.b1b = Unit3D(ch[1], ch[2], (3, 3, 3))
            self.b2a = Unit3D(cin, ch[3])
            self.b2b = Unit3D(ch[3], ch[4], (3, 3, 3))
            self.pool = MaxPoolSame((3, 3, 3), (1, 1, 1))
            self.b3b = Unit3D(cin, ch[5])

        def forward(self, x):
            return torch.cat([
                self.b0(x), self.b1b(self.b1a(x)), self.b2b(self.b2a(x)),
                self.b3b(self.pool(x))], 1)

    class InceptionI3d(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv3d_1a_7x7 = Unit3D(3, 64, (7, 7, 7), (2, 2, 2))
            self.pool_2a = MaxPoolSame((1, 3, 3), (1, 2, 2))
            self.Conv3d_2b_1x1 = Unit3D(64, 64)
            self.Conv3d_2c_3x3 = Unit3D(64, 192, (3, 3, 3))
            self.pool_3a = MaxPoolSame((1, 3, 3), (1, 2, 2))
            chans = {"Mixed_3b": 192, "Mixed_3c": 256, "Mixed_4b": 480,
                     "Mixed_4c": 512, "Mixed_4d": 512, "Mixed_4e": 512,
                     "Mixed_4f": 528, "Mixed_5b": 832, "Mixed_5c": 832}
            for name, cin in chans.items():
                setattr(self, name, Mixed(cin, fvd_mod._MIXED[name]))
            self.pool_4a = MaxPoolSame((3, 3, 3), (2, 2, 2))
            self.pool_5a = MaxPoolSame((2, 2, 2), (2, 2, 2))
            self.logits = Unit3D(1024, 400, use_bn=False, use_bias=True,
                                 relu=False)

        def forward(self, x):
            h = self.Conv3d_1a_7x7(x)
            h = self.pool_2a(h)
            h = self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(h))
            h = self.pool_3a(h)
            h = self.Mixed_3c(self.Mixed_3b(h))
            h = self.pool_4a(h)
            for n in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                      "Mixed_4f"):
                h = getattr(self, n)(h)
            h = self.pool_5a(h)
            h = self.Mixed_5c(self.Mixed_5b(h))
            h = F.avg_pool3d(h, (2, 7, 7), stride=(1, 1, 1))
            h = self.logits(h)
            return h.mean(dim=(2, 3, 4))

    import torch
    net = InceptionI3d()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.Conv3d):
                m.weight.normal_(0.0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.1, generator=g)
            elif isinstance(m, nn.BatchNorm3d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return net.eval()


def test_i3d_graph_matches_torch_replica(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    net = _build_torch_i3d()
    sd_path = str(tmp_path / "i3d.pth")
    torch.save(net.state_dict(), sd_path)
    npz_path = str(tmp_path / "i3d.npz")
    fvd_mod.convert_torch_i3d_npz(sd_path, npz_path)

    monkeypatch.setenv(fvd_mod.WEIGHTS_ENV, npz_path)
    fvd_mod._load_weights.cache_clear()

    rng = np.random.RandomState(3)
    # T=9 keeps the parity check cheap; the protocol's 16f clips follow
    # the identical graph (T only changes the time axis length)
    x01 = rng.rand(1, 9, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(
            x01.transpose(0, 4, 1, 2, 3)) * 2.0 - 1.0).numpy()
    got = np.asarray(fvd_mod.i3d_features(jnp.asarray(x01)))

    fvd_mod._load_weights.cache_clear()
    assert got.shape == (1, 400)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * max(scale, 1.0),
                               rtol=2e-3)

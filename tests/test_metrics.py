import numpy as np
import pytest

from slotdiffusion_tpu.ops import metrics as M

pytestmark = pytest.mark.fast


def test_ari_perfect_and_permuted():
    gt = np.random.RandomState(0).randint(0, 4, size=(3, 16, 16))
    assert M.ARI_metric(gt, gt) == pytest.approx(1.0)
    # relabeling clusters should not change ARI
    perm = np.array([2, 3, 0, 1])
    assert M.ARI_metric(gt, perm[gt]) == pytest.approx(1.0)
    assert M.fARI_metric(gt, perm[gt]) == pytest.approx(1.0)


def test_ari_against_sklearn_formula():
    """Cross-check against a direct contingency-table ARI computation."""
    rs = np.random.RandomState(1)
    gt = rs.randint(0, 5, size=(1, 12, 12))
    pred = rs.randint(0, 7, size=(1, 12, 12))

    def ari_direct(a, b):
        a, b = a.ravel(), b.ravel()
        n = len(a)
        ctab = np.zeros((a.max() + 1, b.max() + 1))
        for i, j in zip(a, b):
            ctab[i, j] += 1
        comb = lambda x: x * (x - 1) / 2
        sum_ij = comb(ctab).sum()
        sum_a = comb(ctab.sum(1)).sum()
        sum_b = comb(ctab.sum(0)).sum()
        expected = sum_a * sum_b / comb(n)
        max_idx = (sum_a + sum_b) / 2
        return (sum_ij - expected) / (max_idx - expected)

    ours = M.ARI_metric(gt, pred)
    direct = ari_direct(gt[0], pred[0])
    assert ours == pytest.approx(direct, abs=1e-9)


def test_ari_degenerate_single_cluster():
    gt = np.zeros((2, 8, 8), dtype=np.int64)
    pred = np.zeros((2, 8, 8), dtype=np.int64)
    assert M.ARI_metric(gt, pred) == pytest.approx(1.0)


def test_miou_identity_and_fg():
    gt = np.zeros((1, 8, 8), dtype=np.int64)
    gt[0, :4] = 1
    gt[0, 4:, :4] = 2
    assert M.miou_metric(gt, gt) == pytest.approx(1.0)
    assert M.fmiou_metric(gt, gt) == pytest.approx(1.0)
    assert M.mbo_metric(gt, gt) == pytest.approx(1.0)


def test_miou_undetected_object_penalty():
    # GT has 3 classes; pred merges 2 of them -> only 2 pred classes
    gt = np.zeros((1, 6, 6), dtype=np.int64)
    gt[0, :2] = 0
    gt[0, 2:4] = 1
    gt[0, 4:] = 2
    pred = np.zeros((1, 6, 6), dtype=np.int64)
    pred[0, 2:] = 1  # classes 1 and 2 merged
    # M(=2) < N(=3): sum of matched IoUs / N
    # best assignment: gt0<->pred0 (iou 1.0), gt1<->pred1 (12/24=0.5)
    val = M.miou_metric(gt, pred)
    assert val == pytest.approx((1.0 + 0.5) / 3)


def test_mbo_reuses_predictions():
    gt = np.zeros((1, 4, 4), dtype=np.int64)
    gt[0, :2] = 1
    gt[0, 2:] = 2
    pred = np.ones((1, 4, 4), dtype=np.int64)  # single pred class covers all
    # each fg gt class best-overlaps the same pred with IoU 8/16
    assert M.mbo_metric(gt, pred) == pytest.approx(0.5)


def test_fg_only_gt_background_is_nan_skipped():
    gt = np.zeros((2, 4, 4), dtype=np.int64)
    gt[1, 2:] = 1
    pred = np.zeros((2, 4, 4), dtype=np.int64)
    pred[1, 2:] = 3
    # first sample has no fg -> nan, second is perfect -> mean = 1.0
    assert M.fmiou_metric(gt, pred) == pytest.approx(1.0)
    assert M.mbo_metric(gt, pred) == pytest.approx(1.0)


def test_overlap_preproc():
    gt = np.array([[1, 1], [2, 2]])
    pred = np.array([[1, 1], [2, 2]])
    ov = np.array([[1, 0], [0, 0]])
    g2, p2 = M.preproc_masks_overlap(gt, pred, ov)
    assert g2[0, 0] == 0
    assert p2[0, 0] == pred.max() + 1
    # originals untouched
    assert gt[0, 0] == 1 and pred[0, 0] == 1


def test_recon_metrics():
    rs = np.random.RandomState(0)
    x = rs.rand(2, 32, 32, 3)
    assert M.mse_metric(x, x) == 0.0
    assert M.psnr_metric(x, x) > 100
    assert M.ssim_metric(x, x) == pytest.approx(1.0, abs=1e-6)
    y = np.clip(x + rs.randn(*x.shape) * 0.1, 0, 1)
    assert 0 < M.ssim_metric(x, y) < 1
    assert M.mse_metric(x, y) > 0
    # psnr of 0.1-sigma noise should be ~20dB
    assert 15 < M.psnr_metric(x, y) < 25


def test_postproc_mask():
    B, T, N, H, W = 1, 1, 3, 4, 4
    masks = np.zeros((B, T, N, H, W), dtype=np.float64)
    masks[0, 0, 1] = 0.9  # slot 1 dominates everywhere
    masks[0, 0, 2, 0, 0] = 0.95  # except one pixel for slot 2
    masks[0, 0, 0] = 0.01  # slot 0 is weakest -> background slot
    # one low-confidence pixel
    masks[0, 0, :, 3, 3] = 0.1
    out = M.postproc_mask(masks)
    assert out.shape == (B, T, H, W)
    assert out[0, 0, 0, 0] == 2
    assert out[0, 0, 1, 1] == 1
    assert out[0, 0, 3, 3] == 0  # bg slot wins low-confidence pixel

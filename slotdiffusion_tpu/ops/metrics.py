"""Evaluation metrics.

Host-side (numpy/scipy) implementations matching the reference's protocol in
img_based/models/eval_utils.py / video_based/models/eval_utils.py:

- ARI / FG-ARI via the one-hot contingency formulation
  (eval_utils.py:138-211, itself from Google's slot-attention-video)
- Hungarian-matched mIoU / FG-mIoU via scipy linear_sum_assignment
  (eval_utils.py:259-349)
- mBO mean best overlap, foreground-only GT matching (eval_utils.py:285-370)
- DINOSAUR overlap-pixel preprocessing for COCO (eval_utils.py:119-135)
- reconstruction metrics: MSE (summed per image), PSNR, SSIM
  (eval_utils.py:73-106; SSIM reproduces skimage's gaussian-weighted variant
  with sigma=1.5 and population covariance, since skimage is not a dep here)

Hungarian matching and per-image python loops are deliberately host-side and
out of any jitted path; the heavy contingency einsum runs in numpy which is
plenty fast at eval resolutions.
"""

import numpy as np
from scipy.ndimage import gaussian_filter
from scipy.optimize import linear_sum_assignment

FG_THRE = 0.5


def _as_int_array(x):
    x = np.asarray(x)
    assert np.issubdtype(x.dtype, np.integer), f"need int masks, got {x.dtype}"
    return x


def _one_hot(x, num_classes=None):
    if num_classes is None:
        num_classes = int(x.max()) + 1
    return np.eye(num_classes, dtype=np.float64)[x]


###########################################
# ARI
###########################################


def adjusted_rand_index(true_ids, pred_ids, ignore_background=False):
    """ARI from integer id masks.

    Args:
        true_ids / pred_ids: int arrays [B, T, H, W] (or [B, H, W]).
        ignore_background: drop true id 0 (FG-ARI).

    Returns:
        [B] float array of per-sequence ARI scores. Degenerate cases (both
        partitions trivial) score 1.0, matching eval_utils.py:180-187.
    """
    true_ids = _as_int_array(true_ids)
    pred_ids = _as_int_array(pred_ids)
    if true_ids.ndim == 3:
        true_ids = true_ids[:, None]
    if pred_ids.ndim == 3:
        pred_ids = pred_ids[:, None]

    true_oh = _one_hot(true_ids)  # [B, T, H, W, C]
    pred_oh = _one_hot(pred_ids)  # [B, T, H, W, K]
    if ignore_background:
        true_oh = true_oh[..., 1:]

    n = np.einsum("bthwc,bthwk->bck", true_oh, pred_oh)
    a = n.sum(-1)  # [B, C]
    b = n.sum(-2)  # [B, K]
    num_points = a.sum(1)

    rindex = (n * (n - 1)).sum((1, 2))
    aindex = (a * (a - 1)).sum(1)
    bindex = (b * (b - 1)).sum(1)
    expected = aindex * bindex / np.clip(num_points * (num_points - 1), 1,
                                         None)
    max_rindex = (aindex + bindex) / 2
    denom = max_rindex - expected
    with np.errstate(divide="ignore", invalid="ignore"):
        ari = (rindex - expected) / denom
    return np.where(denom != 0, ari, 1.0)


def preproc_masks_overlap(gt_mask, pred_mask, inst_overlap_mask=None):
    """DINOSAUR overlap handling (eval_utils.py:119-135): on COCO, pixels
    covered by >1 GT instance go to background in GT and to a fresh class in
    the prediction, removing them from every matching."""
    if inst_overlap_mask is None:
        return gt_mask, pred_mask
    gt_mask = gt_mask.copy()
    pred_mask = pred_mask.copy()
    ov = inst_overlap_mask.astype(bool)
    gt_mask[ov] = 0
    pred_mask[ov] = pred_mask.max() + 1
    return gt_mask, pred_mask


def _apply_overlap(x, y, inst_overlap_mask):
    if inst_overlap_mask is None:
        return x, y
    x, y = x.copy(), y.copy()
    for i in range(x.shape[0]):
        x[i], y[i] = preproc_masks_overlap(x[i], y[i], inst_overlap_mask[i])
    return x, y


def ARI_metric(gt_mask, pred_mask, inst_overlap_mask=None):
    """gt/pred: int [B, H, W] argmaxed masks. Returns scalar mean ARI."""
    gt_mask, pred_mask = _as_int_array(gt_mask), _as_int_array(pred_mask)
    gt_mask, pred_mask = _apply_overlap(gt_mask, pred_mask, inst_overlap_mask)
    return float(
        adjusted_rand_index(gt_mask, pred_mask,
                            ignore_background=False).mean())


def fARI_metric(gt_mask, pred_mask, inst_overlap_mask=None):
    """Foreground ARI: ignores GT background (id 0)."""
    gt_mask, pred_mask = _as_int_array(gt_mask), _as_int_array(pred_mask)
    gt_mask, pred_mask = _apply_overlap(gt_mask, pred_mask, inst_overlap_mask)
    return float(
        adjusted_rand_index(gt_mask, pred_mask,
                            ignore_background=True).mean())


###########################################
# Hungarian mIoU / mBO
###########################################


def _pairwise_iou(gt_flat, pred_flat, ignore_background):
    """IoU matrix between GT classes and predicted classes. [N, M]."""
    true_oh = _one_hot(gt_flat)  # [P, N]
    if ignore_background:
        true_oh = true_oh[:, 1:]
    pred_oh = _one_hot(pred_flat)  # [P, M]
    intersect = true_oh.T @ pred_oh  # [N, M]
    union = true_oh.sum(0)[:, None] + pred_oh.sum(0)[None] - intersect
    return intersect / (union + 1e-8)


def hungarian_miou(gt_mask, pred_mask, ignore_background=True):
    """Hungarian-matched mean IoU on one image; masks are flat int [P].

    Matches eval_utils.py:259-282 including the undetected-object penalty
    when the prediction has fewer classes than GT.
    """
    if gt_mask.max() == 0 and ignore_background:
        return np.nan
    iou = _pairwise_iou(gt_mask, pred_mask, ignore_background)
    n, m = iou.shape
    row_ind, col_ind = linear_sum_assignment(iou, maximize=True)
    if m >= n:
        return float(iou[row_ind, col_ind].mean())
    return float(iou[row_ind, col_ind].sum() / n)


def mean_best_overlap(gt_mask, pred_mask):
    """mBO on one image; flat int [P]. GT background never matched
    (eval_utils.py:285-307); predictions may be reused."""
    if gt_mask.max() == 0:
        return np.nan
    iou = _pairwise_iou(gt_mask, pred_mask, ignore_background=True)
    return float(iou.max(1).mean())


def _batched_mask_metric(fn, gt_mask, pred_mask, inst_overlap_mask=None):
    gt_mask, pred_mask = _as_int_array(gt_mask), _as_int_array(pred_mask)
    B = gt_mask.shape[0]
    gt_mask = gt_mask.reshape(B, -1)
    pred_mask = pred_mask.reshape(B, -1)
    if inst_overlap_mask is not None:
        inst_overlap_mask = np.asarray(inst_overlap_mask).reshape(B, -1)
    vals = []
    for i in range(B):
        ov = None if inst_overlap_mask is None else inst_overlap_mask[i]
        g, p = preproc_masks_overlap(gt_mask[i], pred_mask[i], ov)
        vals.append(fn(g, p))
    if all(np.isnan(v) for v in vals):
        return np.nan
    return float(np.nanmean(vals))


def miou_metric(gt_mask, pred_mask, inst_overlap_mask=None):
    """Hungarian mIoU incl. background; masks int [B, H, W]."""
    return _batched_mask_metric(
        lambda g, p: hungarian_miou(g, p, ignore_background=False),
        gt_mask, pred_mask, inst_overlap_mask)


def fmiou_metric(gt_mask, pred_mask, inst_overlap_mask=None):
    """Hungarian mIoU over foreground GT classes only."""
    return _batched_mask_metric(
        lambda g, p: hungarian_miou(g, p, ignore_background=True),
        gt_mask, pred_mask, inst_overlap_mask)


def mbo_metric(gt_mask, pred_mask, inst_overlap_mask=None):
    """Mean best overlap; masks int [B, H, W]."""
    return _batched_mask_metric(mean_best_overlap, gt_mask, pred_mask,
                                inst_overlap_mask)


###########################################
# Mask post-processing
###########################################


def postproc_mask(batch_masks):
    """Background-aware argmax (eval_utils.py:16-37).

    Args:
        batch_masks: [B, T, N, H, W] soft masks.

    Returns:
        int masks [B, T, H, W].
    """
    batch_masks = np.array(batch_masks, copy=True)
    B, T, N, H, W = batch_masks.shape
    m = batch_masks.reshape(B * T, N, H * W)
    slots_max = m.max(-1)  # [BT, N]
    bg_idx = slots_max.argmin(-1)  # [BT]
    spatial_max = m.max(1)  # [BT, HW]
    bg_mask = spatial_max < FG_THRE  # [BT, HW]
    rows = np.arange(B * T)
    # set the weakest slot's score to 1 on low-confidence pixels, so they
    # argmax to the background slot
    sel = m[rows, bg_idx, :]  # [BT, HW]
    sel[bg_mask] = 1.0
    m[rows, bg_idx, :] = sel
    masks = m.argmax(1)
    return masks.reshape(B, T, H, W)


###########################################
# Reconstruction quality
###########################################


def mse_metric(x, y):
    """x/y: [B, H, W, 3] in [0, 1]. Per-image sum over pixels+channels, then
    batch mean — the convention in eval_utils.py:73-76."""
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return float(((x - y) ** 2).reshape(x.shape[0], -1).sum(-1).mean())


def psnr_metric(x, y, data_range=1.0):
    """x/y: [B, H, W, 3] in [0, 1]. Mean per-image PSNR."""
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    mse = ((x - y) ** 2).reshape(x.shape[0], -1).mean(-1)
    mse = np.maximum(mse, 1e-12)
    return float(np.mean(10.0 * np.log10(data_range ** 2 / mse)))


def _ssim_single(x, y, data_range, sigma=1.5, truncate=3.5):
    """Gaussian-weighted SSIM on one [H, W] channel, population covariance.

    Reproduces skimage.metrics.structural_similarity with
    gaussian_weights=True, sigma=1.5, use_sample_covariance=False — the exact
    settings at eval_utils.py:95-105.
    """
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    filt = lambda a: gaussian_filter(a, sigma, truncate=truncate)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    # skimage crops the filter radius from each border before averaging
    r = int(truncate * sigma + 0.5)
    if ssim_map.shape[0] > 2 * r and ssim_map.shape[1] > 2 * r:
        ssim_map = ssim_map[r:-r, r:-r]
    return ssim_map.mean()


def ssim_metric(x, y):
    """x/y: [B, H, W, 3] in [0, 1]. Matches the reference's 255-scaled,
    channel-averaged gaussian SSIM (eval_utils.py:91-106)."""
    x = np.asarray(x, np.float64) * 255.0
    y = np.asarray(y, np.float64) * 255.0
    vals = [
        np.mean([
            _ssim_single(x[i, ..., c], y[i, ..., c], data_range=255)
            for c in range(x.shape[-1])
        ]) for i in range(x.shape[0])
    ]
    return float(np.mean(vals))


def masks_to_boxes(masks, num_boxes=7):
    """Convert argmaxed seg masks [B, T, H, W] to per-slot xyxy boxes
    [B, T, N, 4]; empty masks get [-1, -1, -1, -1] (eval_utils.py:40-65)."""
    masks = _as_int_array(masks)
    B, T, H, W = masks.shape
    boxes = np.full((B, T, num_boxes, 4), -1.0, dtype=np.float64)
    ys = np.arange(H)
    xs = np.arange(W)
    for b in range(B):
        for t in range(T):
            for n in range(num_boxes):
                bin_mask = masks[b, t] == n
                if not bin_mask.any():
                    continue
                row_any = bin_mask.any(axis=1)
                col_any = bin_mask.any(axis=0)
                y1, y2 = ys[row_any][0], ys[row_any][-1]
                x1, x2 = xs[col_any][0], xs[col_any][-1]
                boxes[b, t, n] = (x1, y1, x2, y2)
    return boxes

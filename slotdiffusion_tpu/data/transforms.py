"""Image/video transforms.

Rebuild of the reference `BaseTransforms` (video_based/datasets/utils.py:
33-66, img variant img_based/datasets/utils.py:39-71): ToTensor ->
Normalize(0.5, 0.5) to [-1, 1] -> Resize; masks resized with NEAREST.
NHWC numpy outputs (the loader stacks, the device step consumes directly).
"""

import numpy as np
from PIL import Image


def suppress_mask_idx(mask):
    """Relabel mask ids to consecutive 0..K ints
    (video_based/datasets/utils.py `suppress_mask_idx` semantics)."""
    ids = np.unique(mask)
    lut = np.zeros(int(ids.max()) + 1, dtype=mask.dtype)
    for new, old in enumerate(ids):
        lut[old] = new
    return lut[mask]


class BaseTransforms:
    """img: PIL/np [H, W, 3] uint8 -> float32 [-1, 1], resized NHWC."""

    def __init__(self, resolution, norm_mean=0.5, norm_std=0.5):
        self.resolution = tuple(resolution)  # (H, W)
        self.norm_mean = norm_mean
        self.norm_std = norm_std

    def __call__(self, img):
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        img = img.resize(self.resolution[::-1], Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - self.norm_mean) / self.norm_std

    def load_image(self, path):
        """Read + resize + normalize one image file.

        JPEGs with the standard (0.5, 0.5) normalization go through the
        native fused decode-resize-normalize path (native/fastio.cpp, one
        C call instead of four PIL/numpy passes); everything else falls
        back to PIL. Raises OSError/FileNotFoundError like Image.open."""
        if (self.norm_mean, self.norm_std) == (0.5, 0.5) and \
                path.lower().endswith((".jpg", ".jpeg")):
            from .fastio import decode_jpeg_norm
            out = decode_jpeg_norm(path, self.resolution)
            if out is not None:
                return out
        return self(Image.open(path).convert("RGB"))

    def process_mask(self, mask):
        """int mask [H, W] -> resized with NEAREST, int32."""
        m = Image.fromarray(np.asarray(mask).astype(np.int32), mode="I")
        m = m.resize(self.resolution[::-1], Image.NEAREST)
        return np.asarray(m, np.int32)

    def load_mask(self, path):
        """Read + NEAREST-resize one id-mask PNG to int32 [H, W].

        Native-grayscale PNGs (MOVi's `{frame}_mask.png` layout) go
        through the fused native decode+resize (native/fastio.cpp);
        RGB-coded or palette masks return None so the caller can apply
        its own id-flattening on the PIL decode."""
        if path.lower().endswith(".png"):
            from .fastio import decode_png_mask
            out = decode_png_mask(path, self.resolution)
            if out is not None:
                return out.astype(np.int32)
        return None

    def denormalize_image(self, img):
        return np.clip(img * self.norm_std + self.norm_mean, 0.0, 1.0)

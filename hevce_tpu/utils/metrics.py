"""Quality metrics: MSE/PSNR (reference src/HEVCeMain.c:116-133) and SSIM
(HEVCeval.py:188 uses scikit-image; implemented here directly to avoid the
dependency — skimage defaults: uniform 7x7 window, unbiased covariance)."""
import math

import numpy as np


def mse_psnr(a: np.ndarray, b: np.ndarray):
    """MSE/PSNR over the overlapping region (min-crop, src/HEVCeMain.c:121-124)."""
    h = min(a.shape[0], b.shape[0])
    w = min(a.shape[1], b.shape[1])
    d = a[:h, :w].astype(np.float64) - b[:h, :w].astype(np.float64)
    mse = float((d * d).mean())
    psnr = 99.0 if mse <= 0 else 10.0 * math.log10(255.0 * 255.0 / mse)
    return mse, psnr


def _filter2(img, win):
    # 'valid' 2-D correlation via stride tricks
    from numpy.lib.stride_tricks import sliding_window_view
    v = sliding_window_view(img, win.shape)
    return np.einsum("ijkl,kl->ij", v, win)


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM, matching skimage.metrics.structural_similarity defaults for
    uint8 inputs with gaussian_weights=False (7x7 uniform window) — the
    HEVCeval.py call uses plain defaults; we mirror those (uniform 7x7)."""
    h = min(a.shape[0], b.shape[0])
    w = min(a.shape[1], b.shape[1])
    x = a[:h, :w].astype(np.float64)
    y = b[:h, :w].astype(np.float64)
    win = 7
    ux = _filter2(x, np.full((win, win), 1.0 / (win * win)))
    uy = _filter2(y, np.full((win, win), 1.0 / (win * win)))
    uxx = _filter2(x * x, np.full((win, win), 1.0 / (win * win)))
    uyy = _filter2(y * y, np.full((win, win), 1.0 / (win * win)))
    uxy = _filter2(x * y, np.full((win, win), 1.0 / (win * win)))
    # skimage uses unbiased (N/(N-1)) covariance normalization
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return float(s.mean())

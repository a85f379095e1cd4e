"""Image / registration quality metrics.

PSNR and SSIM match the reference formulas (utils.py:14-22 mse2psnr;
conerf/loss/ssim_torch.py:81-89 windowed-Gaussian SSIM; the numpy
mipnerf-derived ssim in root utils.py) so metrics.json artifacts are
comparable. LPIPS runs host-side through torch (AlexNet features) when
torchvision weights are available, else reports None — it is an eval-only
metric and stays off the TPU path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def mse_to_psnr(x: jnp.ndarray) -> jnp.ndarray:
    return -10.0 / jnp.log(10.0) * jnp.log(x)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return mse_to_psnr(mse(pred, target))


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """SSIM over [H, W, C] images (separable Gaussian window, mipnerf-style)."""
    img0 = img0.astype(jnp.float32)
    img1 = img1.astype(jnp.float32)
    kernel = jnp.asarray(_gaussian_kernel(filter_size, filter_sigma), jnp.float32)

    def blur(img):
        # separable conv along H then W, per channel; NHWC with batch 1
        x = img[None]  # [1, H, W, C]
        kh = kernel.reshape(filter_size, 1, 1, 1)
        kw = kernel.reshape(1, filter_size, 1, 1)
        dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
        c = img.shape[-1]
        out = jax.lax.conv_general_dilated(
            x, jnp.tile(kh, (1, 1, 1, c)), (1, 1), "VALID",
            dimension_numbers=dn, feature_group_count=c,
        )
        out = jax.lax.conv_general_dilated(
            out, jnp.tile(kw, (1, 1, 1, c)), (1, 1), "VALID",
            dimension_numbers=dn, feature_group_count=c,
        )
        return out[0]

    mu0 = blur(img0)
    mu1 = blur(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = blur(img0 * img0) - mu00
    s11 = blur(img1 * img1) - mu11
    s01 = blur(img0 * img1) - mu01
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    num = (2 * mu01 + c1) * (2 * s01 + c2)
    den = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)


def lpips(img0: np.ndarray, img1: np.ndarray) -> float | None:
    """True LPIPS(alex) via utils/lpips.py (AlexNet taps + learned linear
    calibration — the reference's `lpips` package math, utils.py:188-200).

    Returns None when the calibration weights npz is absent (zero-egress
    image; export with scripts/preprocess/export_lpips_weights.py). Never
    reports an uncalibrated stand-in under this name."""
    from dregnerf_tpu.utils.lpips import lpips_fn

    fn = lpips_fn()
    if fn is None:
        return None
    return float(fn(jnp.asarray(img0, jnp.float32), jnp.asarray(img1, jnp.float32)))


def lpips_rand(img0: np.ndarray, img1: np.ndarray) -> float:
    """Random-feature perceptual distance on the LPIPS(alex) architecture
    (utils/lpips.random_feature_weights): the hermetic fallback column,
    reported as `lpips_rand_alex` — NOT comparable to published LPIPS
    values, but a real perceptual metric (Zhang et al. 2018 §5 validate
    random-network feature distances against human judgments)."""
    from dregnerf_tpu.utils.lpips import lpips_rand_fn

    fn = lpips_rand_fn()
    return float(fn(jnp.asarray(img0, jnp.float32), jnp.asarray(img1, jnp.float32)))

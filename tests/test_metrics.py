"""PSNR/SSIM metric formula checks (the eval parity contract)."""
import jax.numpy as jnp
import numpy as np

from dregnerf_tpu.utils import metrics as M


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        psnr = float(M.psnr(a, b))
        np.testing.assert_allclose(psnr, -10 * np.log10(0.01), rtol=1e-5)

    def test_identical_is_inf(self):
        a = jnp.ones((4, 4, 3)) * 0.5
        assert float(M.psnr(a, a)) == np.inf


class TestSSIM:
    def test_identical_images(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
        np.testing.assert_allclose(float(M.ssim(img, img)), 1.0, atol=1e-5)

    def test_noise_reduces_ssim(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
        noisy = jnp.clip(img + jnp.asarray(rng.normal(size=(32, 32, 3)) * 0.2), 0, 1)
        s = float(M.ssim(img, noisy))
        assert 0.0 < s < 0.95

    def test_inverted_is_low(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
        s = float(M.ssim(img, 1.0 - img))
        assert s < 0.3

    def test_constant_shift_penalized_by_luminance(self):
        img = jnp.full((32, 32, 3), 0.3)
        s = float(M.ssim(img, img + 0.4))
        assert s < 1.0


class TestLPIPSGating:
    def test_returns_none_without_torchvision(self, rng):
        out = M.lpips(rng.uniform(size=(16, 16, 3)), rng.uniform(size=(16, 16, 3)))
        assert out is None or isinstance(out, float)

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


def test_lpips_matches_torch_reference(tmp_path, rng):
    """JAX LPIPS == an independent torch implementation of the LPIPS(alex)
    math on the SAME synthetic weights (formula + weight-layout fidelity;
    calibration weights load from the exported npz at deploy time)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from dregnerf_tpu.utils import lpips as L

    # synthetic weight file in the exporter's schema
    weights = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(L._ALEX_CONVS):
        weights[f"conv{i}.kernel"] = rng.normal(
            scale=0.1, size=(k, k, cin, cout)
        ).astype(np.float32)
        weights[f"conv{i}.bias"] = rng.normal(scale=0.1, size=(cout,)).astype(
            np.float32
        )
        weights[f"lin{i}"] = rng.uniform(size=(cout,)).astype(np.float32)
        cin = cout
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **weights)

    img0 = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    img1 = rng.uniform(size=(64, 64, 3)).astype(np.float32)

    params = L.load_weights(str(path))
    got = float(L.lpips_distance(params, img0, img1))

    # independent torch reference (NCHW)
    def norm_in(x):
        t = torch.from_numpy(x).permute(2, 0, 1)[None] * 2.0 - 1.0
        shift = torch.tensor(L._SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(L._SCALE).view(1, 3, 1, 1)
        return (t - shift) / scale

    def taps(t):
        outs = []
        for i, (cout, k, stride, pad) in enumerate(L._ALEX_CONVS):
            w = torch.from_numpy(
                np.transpose(weights[f"conv{i}.kernel"], (3, 2, 0, 1))
            )
            b = torch.from_numpy(weights[f"conv{i}.bias"])
            t = F.relu(F.conv2d(t, w, b, stride=stride, padding=pad))
            outs.append(t)
            if i in L._POOL_AFTER:
                t = F.max_pool2d(t, 3, stride=2)
        return outs

    with torch.no_grad():
        f0, f1 = taps(norm_in(img0)), taps(norm_in(img1))
        want = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / (a.norm(dim=1, keepdim=True) + 1e-10)
            b = b / (b.norm(dim=1, keepdim=True) + 1e-10)
            lin = torch.from_numpy(weights[f"lin{i}"]).view(1, -1, 1, 1)
            want += ((a - b) ** 2 * lin).sum(dim=1).mean().item()

    np.testing.assert_allclose(got, want, rtol=2e-4)

    # the metrics entry point honors the env var and returns a float
    import os

    from dregnerf_tpu.utils import metrics as M

    old = os.environ.get(L.DEFAULT_WEIGHTS_ENV)
    os.environ[L.DEFAULT_WEIGHTS_ENV] = str(path)
    try:
        L._cached_fn.cache_clear()
        v = M.lpips(img0, img1)
        assert v is not None
        np.testing.assert_allclose(v, want, rtol=2e-4)
    finally:
        L._cached_fn.cache_clear()
        if old is None:
            os.environ.pop(L.DEFAULT_WEIGHTS_ENV, None)
        else:
            os.environ[L.DEFAULT_WEIGHTS_ENV] = old

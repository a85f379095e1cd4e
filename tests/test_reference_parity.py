"""Golden numerical-parity tests against the reference torch modules.

The reference's dependency-light torch modules import cleanly in this image
(torch CPU). Each test syncs weights/inputs and asserts my JAX
implementation matches the reference to float32 tolerance:

  * weighted Kabsch            vs conerf/register/se3.py:89-140
  * SE(3) cat/inv/transform    vs conerf/register/se3.py:24-60
  * cross-encoder layer stack  vs conerf/register/transformer.py:35-317
  * sine position embedding    vs conerf/register/position_embedding.py:8-53
  * InfoNCE feature loss       vs conerf/loss/feature_loss.py:4-73
  * hat / so3 / se3 exp maps   vs conerf/geometry/pose_util.py:6-243
  * rotation distance (RRE)    vs conerf/geometry/pose_util.py:320-337
  * SSIM window/formula        vs conerf/loss/ssim_torch.py:9-51

This is the golden layer SURVEY.md §4 calls for ("golden-value parity
tests against saved PyTorch-reference tensors") — computed live against
the actual reference code rather than saved tensors.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from conerf.geometry import pose_util  # noqa: E402
from conerf.loss.feature_loss import InfoNCELoss  # noqa: E402
from conerf.loss.ssim_torch import create_window  # noqa: E402
from conerf.register import se3 as ref_se3  # noqa: E402
from conerf.register.position_embedding import (  # noqa: E402
    PositionEmbeddingCoordsSine as RefSine,
)
from conerf.register.transformer import (  # noqa: E402
    TransformerCrossEncoder as RefEncoder,
    TransformerCrossEncoderLayer as RefLayer,
)

from dregnerf_tpu.geometry import se3 as my_se3  # noqa: E402
from dregnerf_tpu.geometry.kabsch import weighted_rigid_transform  # noqa: E402
from dregnerf_tpu.losses.registration import infonce_loss  # noqa: E402
from dregnerf_tpu.models.pos_embed import PositionEmbeddingCoordsSine  # noqa: E402
from dregnerf_tpu.models.transformer import TransformerCrossEncoder  # noqa: E402
from dregnerf_tpu.utils.metrics import ssim as my_ssim  # noqa: E402


def t2j(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.detach().cpu().numpy())


def j2n(x) -> np.ndarray:
    return np.asarray(x)


# --------------------------------------------------------------- Kabsch/SE(3)
class TestKabsch:
    def test_weighted(self):
        g = torch.Generator().manual_seed(0)
        a = torch.randn(64, 3, generator=g)
        rot = torch.linalg.qr(torch.randn(3, 3, generator=g)).Q
        if torch.det(rot) < 0:
            rot[:, 2] *= -1
        b = a @ rot.T + torch.tensor([0.3, -0.2, 0.5]) + 0.01 * torch.randn(64, 3, generator=g)
        w = torch.rand(64, generator=g)

        ref = ref_se3.compute_rigid_transform(a, b, w)
        mine = weighted_rigid_transform(t2j(a), t2j(b), t2j(w))
        np.testing.assert_allclose(j2n(mine), ref.numpy(), atol=1e-4, rtol=1e-4)

    def test_unweighted_and_batched(self):
        g = torch.Generator().manual_seed(1)
        a = torch.randn(4, 32, 3, generator=g)
        b = torch.randn(4, 32, 3, generator=g)
        ref = ref_se3.compute_rigid_transform(a, b, None)
        ones = jnp.ones((4, 32))
        mine = weighted_rigid_transform(t2j(a), t2j(b), ones)
        np.testing.assert_allclose(j2n(mine), ref.numpy(), atol=1e-4, rtol=1e-4)

    def test_reflection_fix(self):
        # planar points invite reflections; det fix must agree
        g = torch.Generator().manual_seed(2)
        a = torch.randn(48, 3, generator=g)
        a[:, 2] *= 0.01
        b = -a.clone()  # near-reflection target
        w = torch.rand(48, generator=g)
        ref = ref_se3.compute_rigid_transform(a, b, w)
        mine = weighted_rigid_transform(t2j(a), t2j(b), t2j(w))
        assert np.linalg.det(j2n(mine)[:3, :3]) > 0
        np.testing.assert_allclose(j2n(mine), ref.numpy(), atol=1e-3, rtol=1e-3)


class TestSE3Ops:
    def _rand_pose(self, seed):
        t = pose_util.random_SE3(2)  # [2, 4, 4]
        return t[:, :3, :]

    def test_cat_inv_transform(self):
        a = self._rand_pose(0)
        b = self._rand_pose(1)
        pts = torch.randn(2, 17, 3)

        np.testing.assert_allclose(
            j2n(my_se3.se3_cat(t2j(a), t2j(b))), ref_se3.se3_cat(a, b).numpy(),
            atol=1e-5, rtol=1e-5,
        )
        np.testing.assert_allclose(
            j2n(my_se3.se3_inv(t2j(a))), ref_se3.se3_inv(a).numpy(),
            atol=1e-5, rtol=1e-5,
        )
        np.testing.assert_allclose(
            j2n(my_se3.se3_transform(t2j(a), t2j(pts))),
            ref_se3.se3_transform(a, pts).numpy(),
            atol=1e-5, rtol=1e-5,
        )


class TestExpMaps:
    def test_hat(self):
        v = torch.randn(8, 3)
        np.testing.assert_allclose(
            j2n(my_se3.hat(t2j(v))), pose_util.hat(v).numpy(), atol=1e-6
        )

    def test_so3_exp(self):
        v = torch.randn(16, 3)
        ref = pose_util.so3_exp_map(v)
        np.testing.assert_allclose(
            j2n(my_se3.so3_exp(t2j(v))), ref.numpy(), atol=1e-5, rtol=1e-5
        )

    def test_so3_exp_small_angle(self):
        v = torch.randn(4, 3) * 1e-5
        ref = pose_util.so3_exp_map(v)
        np.testing.assert_allclose(
            j2n(my_se3.so3_exp(t2j(v))), ref.numpy(), atol=1e-4
        )

    def test_se3_exp(self):
        # reference layout: [log_translation | log_rotation]; mine: (omega, v)
        log = torch.randn(8, 6)
        ref = pose_util.se3_exp_map(log)  # [8, 4, 4]
        xi = jnp.concatenate([t2j(log[:, 3:]), t2j(log[:, :3])], axis=-1)
        mine = my_se3.se3_exp(xi)  # [8, 3, 4]
        np.testing.assert_allclose(
            j2n(mine), ref[:, :3, :].numpy(), atol=1e-5, rtol=1e-5
        )

    def test_rotation_distance(self):
        r1 = pose_util.random_SO3(8)
        r2 = pose_util.random_SO3(8)
        ref_deg = torch.rad2deg(pose_util.rotation_distance(r1, r2))
        mine = my_se3.rotation_distance_deg(t2j(r1), t2j(r2))
        np.testing.assert_allclose(j2n(mine), ref_deg.numpy(), atol=1e-3)


# ------------------------------------------------------------------- pos-emb
class TestPositionEmbedding:
    @pytest.mark.parametrize("d_model", [256, 96])
    def test_sine(self, d_model):
        ref = RefSine(n_dim=3, d_model=d_model, temperature=1000, scale=None)
        xyz = torch.rand(2, 11, 3) * 2 - 1
        want = ref(xyz)

        mod = PositionEmbeddingCoordsSine(n_dim=3, d_model=d_model)
        got = mod.apply({"params": {}}, t2j(xyz))
        np.testing.assert_allclose(j2n(got), want.numpy(), atol=1e-4, rtol=1e-4)


# -------------------------------------------------------------- cross-encoder
def _mha_params(mha: torch.nn.MultiheadAttention, d: int, h: int) -> dict:
    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    wo = mha.out_proj.weight.detach().numpy()
    bo = mha.out_proj.bias.detach().numpy()
    hd = d // h

    def proj(wi, bi):
        return {
            "kernel": jnp.asarray(wi.T.reshape(d, h, hd)),
            "bias": jnp.asarray(bi.reshape(h, hd)),
        }

    return {
        "query": proj(w[:d], b[:d]),
        "key": proj(w[d : 2 * d], b[d : 2 * d]),
        "value": proj(w[2 * d :], b[2 * d :]),
        "out": {
            "kernel": jnp.asarray(wo.T.reshape(h, hd, d)),
            "bias": jnp.asarray(bo),
        },
    }


def _dense_params(lin: torch.nn.Linear) -> dict:
    return {
        "kernel": jnp.asarray(lin.weight.detach().numpy().T),
        "bias": jnp.asarray(lin.bias.detach().numpy()),
    }


def _ln_params(ln: torch.nn.LayerNorm) -> dict:
    return {
        "scale": jnp.asarray(ln.weight.detach().numpy()),
        "bias": jnp.asarray(ln.bias.detach().numpy()),
    }


class TestCrossEncoder:
    def test_stack_parity_with_padding(self):
        d, h, ffn, L = 64, 4, 128, 2
        torch.manual_seed(0)
        ref_layer = RefLayer(
            pos_emb_dim=d, num_heads=h, dim_feedforward=ffn, dropout=0.0,
            activation="relu", normalize_before=True,
            sa_val_has_pos_emb=True, ca_val_has_pos_emb=True,
        )
        ref_enc = RefEncoder(
            ref_layer, num_layers=L, norm=torch.nn.LayerNorm(d),
            return_intermediate=True,
        ).eval()

        B, Ns, Nt = 2, 12, 10
        src = torch.randn(Ns, B, d)
        tgt = torch.randn(Nt, B, d)
        src_pos = torch.randn(Ns, B, d)
        tgt_pos = torch.randn(Nt, B, d)
        # padding: last 3 src tokens of batch 0, last 2 tgt tokens of batch 1
        src_pad = torch.zeros(B, Ns, dtype=torch.bool)
        src_pad[0, -3:] = True
        tgt_pad = torch.zeros(B, Nt, dtype=torch.bool)
        tgt_pad[1, -2:] = True

        with torch.no_grad():
            ref_src, ref_tgt = ref_enc(
                src, tgt, src_key_padding_mask=src_pad,
                tgt_key_padding_mask=tgt_pad, src_pos=src_pos, tgt_pos=tgt_pos,
            )  # [L, N, B, d]

        # sync weights into the flax encoder
        layers = {}
        for i, lay in enumerate(ref_enc.layers):
            layers[f"layer{i}"] = {
                "self_attn": _mha_params(lay.self_attn, d, h),
                "cross_attn": _mha_params(lay.cross_attn, d, h),
                "norm1": _ln_params(lay.norm1),
                "norm2": _ln_params(lay.norm2),
                "norm3": _ln_params(lay.norm3),
                "ffn1": _dense_params(lay.linear1),
                "ffn2": _dense_params(lay.linear2),
            }
        layers["final_norm"] = _ln_params(ref_enc.norm)

        enc = TransformerCrossEncoder(
            num_layers=L, d_model=d, num_heads=h, dim_feedforward=ffn
        )
        # batch-first layout for mine
        j = lambda x: t2j(x.permute(1, 0, 2))
        got_src, got_tgt = enc.apply(
            {"params": layers},
            j(src), j(tgt),
            ~t2j(src_pad), ~t2j(tgt_pad),
            j(src_pos), j(tgt_pos),
        )  # [L, B, N, d]

        ref_src_b = ref_src.permute(0, 2, 1, 3).numpy()
        ref_tgt_b = ref_tgt.permute(0, 2, 1, 3).numpy()
        valid_s = ~src_pad.numpy()
        valid_t = ~tgt_pad.numpy()
        # compare valid positions only (padded queries are garbage both sides)
        np.testing.assert_allclose(
            j2n(got_src)[:, valid_s], ref_src_b[:, valid_s], atol=2e-4, rtol=2e-4
        )
        np.testing.assert_allclose(
            j2n(got_tgt)[:, valid_t], ref_tgt_b[:, valid_t], atol=2e-4, rtol=2e-4
        )


# ------------------------------------------------------------------- InfoNCE
class TestInfoNCE:
    def test_parity(self):
        d = 32
        torch.manual_seed(3)
        ref = InfoNCELoss(d_embed=d, r_p=0.2, r_n=0.4)
        n_a, n_p = 40, 36
        af = torch.randn(n_a, d)
        pf = torch.randn(n_p, d)
        ax = torch.rand(n_a, 3)
        px = ax[:n_p] + 0.05 * torch.randn(n_p, 3)  # ensure matches exist

        with torch.no_grad():
            want = ref.compute_infonce(af, pf, ax, px)

        got = infonce_loss(
            t2j(ref.W), t2j(af), t2j(pf), t2j(ax), t2j(px),
            jnp.ones(n_a, bool), jnp.ones(n_p, bool), r_p=0.2, r_n=0.4,
        )
        np.testing.assert_allclose(float(got), float(want), atol=1e-4, rtol=1e-4)

    def test_parity_other_radii(self):
        d = 16
        torch.manual_seed(4)
        ref = InfoNCELoss(d_embed=d, r_p=0.3, r_n=0.5)
        af = torch.randn(24, d)
        pf = torch.randn(24, d)
        ax = torch.rand(24, 3)
        px = torch.rand(24, 3)
        with torch.no_grad():
            want = ref.compute_infonce(af, pf, ax, px)
        got = infonce_loss(
            t2j(ref.W), t2j(af), t2j(pf), t2j(ax), t2j(px),
            jnp.ones(24, bool), jnp.ones(24, bool), r_p=0.3, r_n=0.5,
        )
        np.testing.assert_allclose(float(got), float(want), atol=1e-4, rtol=1e-4)


# --------------------------------------------------------------------- LPIPS
class TestLPIPSMath:
    """Golden test of utils/lpips.py against a torch re-derivation of the
    published `lpips` package pipeline (Zhang et al. 2018: ScalingLayer ->
    alexnet.features taps -> unit-normalize -> squared diff -> non-negative
    1x1 lin calibration -> spatial mean -> sum), on a tiny synthetic
    weight set. Reference usage: /root/reference/utils.py:188-200."""

    _ALEX = [
        # (cin, cout, k, stride, pad, pool_after)
        (3, 64, 11, 4, 2, True),
        (64, 192, 5, 1, 2, True),
        (192, 384, 3, 1, 1, False),
        (384, 256, 3, 1, 1, False),
        (256, 256, 3, 1, 1, False),
    ]

    def _synthetic_weights(self, seed=0):
        g = torch.Generator().manual_seed(seed)
        params = {}
        for i, (cin, cout, k, _, _, _) in enumerate(self._ALEX):
            params[f"conv{i}.weight"] = 0.1 * torch.randn(cout, cin, k, k, generator=g)
            params[f"conv{i}.bias"] = 0.1 * torch.randn(cout, generator=g)
            params[f"lin{i}"] = torch.rand(cout, generator=g)
        return params

    def _torch_lpips(self, params, img0, img1):
        """The lpips-package math in torch functional ops (NCHW)."""
        import torch.nn.functional as F

        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def taps(x):
            h = (x * 2 - 1 - shift) / scale
            outs = []
            for i, (_, _, _, s, p, pool) in enumerate(self._ALEX):
                h = F.relu(
                    F.conv2d(
                        h, params[f"conv{i}.weight"], params[f"conv{i}.bias"],
                        stride=s, padding=p,
                    )
                )
                outs.append(h)
                if pool:
                    h = F.max_pool2d(h, 3, stride=2)
            return outs

        t0, t1 = taps(img0), taps(img1)
        total = 0.0
        for i, (a, b) in enumerate(zip(t0, t1)):
            a = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            b = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            d = (a - b) ** 2
            w = params[f"lin{i}"].view(1, -1, 1, 1)
            total = total + (d * w).sum(dim=1).mean(dim=(1, 2))
        return total

    def test_golden_synthetic_weights(self, tmp_path):
        from dregnerf_tpu.utils import lpips as my_lpips

        params = self._synthetic_weights()
        # export in the documented npz schema (HWIO kernels)
        npz = {}
        for i in range(5):
            npz[f"conv{i}.kernel"] = (
                params[f"conv{i}.weight"].permute(2, 3, 1, 0).numpy()
            )
            npz[f"conv{i}.bias"] = params[f"conv{i}.bias"].numpy()
            npz[f"lin{i}"] = params[f"lin{i}"].numpy()
        path = str(tmp_path / "lpips_alex.npz")
        np.savez(path, **npz)
        jparams = my_lpips.load_weights(path)

        g = torch.Generator().manual_seed(7)
        img0 = torch.rand(1, 3, 64, 64, generator=g)
        img1 = torch.rand(1, 3, 64, 64, generator=g)
        with torch.no_grad():
            want = float(self._torch_lpips(params, img0, img1)[0])

        got = float(
            my_lpips.lpips_distance(
                jparams,
                t2j(img0[0].permute(1, 2, 0)),
                t2j(img1[0].permute(1, 2, 0)),
            )
        )
        assert abs(got - want) < 1e-4, (got, want)

    def test_identical_images_zero(self, tmp_path):
        from dregnerf_tpu.utils import lpips as my_lpips

        params = self._synthetic_weights()
        npz = {}
        for i in range(5):
            npz[f"conv{i}.kernel"] = (
                params[f"conv{i}.weight"].permute(2, 3, 1, 0).numpy()
            )
            npz[f"conv{i}.bias"] = params[f"conv{i}.bias"].numpy()
            npz[f"lin{i}"] = params[f"lin{i}"].numpy()
        path = str(tmp_path / "lpips_alex.npz")
        np.savez(path, **npz)
        jparams = my_lpips.load_weights(path)
        img = jnp.asarray(np.random.default_rng(0).random((64, 64, 3)), jnp.float32)
        assert float(my_lpips.lpips_distance(jparams, img, img)) < 1e-8


# ---------------------------------------------------------------------- SSIM
class TestSSIM:
    def test_window_and_formula(self):
        """Reference pads with zeros (SAME); mine is VALID. Compare the
        reference conv pipeline on the interior region against mine."""
        import torch.nn.functional as F

        g = torch.Generator().manual_seed(5)
        h = w = 64
        img0 = torch.rand(1, 3, h, w, generator=g)
        img1 = (img0 + 0.1 * torch.randn(1, 3, h, w, generator=g)).clamp(0, 1)

        window = create_window(11, 3)
        pad = 0  # VALID

        def blur(x):
            return F.conv2d(x, window, padding=pad, groups=3)

        mu0, mu1 = blur(img0), blur(img1)
        s00 = blur(img0 * img0) - mu0 * mu0
        s11 = blur(img1 * img1) - mu1 * mu1
        s01 = blur(img0 * img1) - mu0 * mu1
        c1, c2 = 0.01**2, 0.03**2
        ref_map = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
            (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
        )
        want = float(ref_map.mean())

        got = float(
            my_ssim(
                t2j(img0[0].permute(1, 2, 0)), t2j(img1[0].permute(1, 2, 0))
            )
        )
        assert abs(got - want) < 1e-5

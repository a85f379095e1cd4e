"""Registration model stack tests (subsample, transformer, full NeRFRegTr)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dregnerf_tpu.ops.voxel_subsample import (
    PointSet,
    hierarchical_subsample,
    masked_select_first_k,
    voxel_downsample,
)


def make_pointset(rng, n, n_valid, f=8):
    xyz = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    valid = jnp.arange(n) < n_valid
    return PointSet(
        xyz=xyz * valid[:, None], feats=feats * valid[:, None],
        valid=valid, count=jnp.int32(n_valid),
    )


class TestVoxelDownsample:
    def test_merges_points_in_same_cell(self, rng):
        xyz = jnp.array(
            [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [1.0, 1.0, 1.0], [0, 0, 0]]
        )
        feats = jnp.array([[1.0], [3.0], [5.0], [0.0]])
        valid = jnp.array([True, True, True, False])
        ps = PointSet(xyz, feats, valid, jnp.int32(3))
        out = voxel_downsample(ps, cell_size=0.1)
        assert int(out.count) == 2
        got = np.sort(np.asarray(out.feats[:2, 0]))
        np.testing.assert_allclose(got, [2.0, 5.0])  # mean(1,3)=2 and 5

    def test_count_never_increases(self, rng):
        ps = make_pointset(rng, 512, 300)
        out = voxel_downsample(ps, 0.05)
        assert int(out.count) <= 300
        out2 = voxel_downsample(out, 0.1)
        assert int(out2.count) <= int(out.count)

    def test_invalid_points_excluded(self, rng):
        ps = make_pointset(rng, 64, 10)
        out = voxel_downsample(ps, 0.01)  # tiny cells: no merging
        assert int(out.count) == 10
        assert not bool(out.valid[10:].any())

    def test_grad_flows_through_features(self, rng):
        ps = make_pointset(rng, 64, 50)

        def loss(feats):
            out = voxel_downsample(ps._replace(feats=feats), 0.3)
            return jnp.sum(out.feats**2)

        g = jax.grad(loss)(ps.feats)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g[:50])).sum() > 0

    def test_hierarchical_selects_capped_level(self, rng):
        src = make_pointset(rng, 4096, 4000)
        tgt = make_pointset(rng, 4096, 3900)
        s, t, level = hierarchical_subsample(src, tgt, 6, 0.05, max_points=500)
        assert int(s.count) + int(t.count) <= 1000
        assert 0 <= int(level) < 6

    def test_hierarchical_small_input_stops_at_level0(self, rng):
        src = make_pointset(rng, 256, 100)
        tgt = make_pointset(rng, 256, 100)
        s, t, level = hierarchical_subsample(src, tgt, 6, 0.05, max_points=1500)
        assert int(level) == 0


class TestMaskedSelect:
    def test_first_k(self):
        mask = jnp.array([False, True, False, True, True, False])
        idx, valid = masked_select_first_k(mask, 4)
        np.testing.assert_array_equal(np.asarray(idx[:3]), [1, 3, 4])
        np.testing.assert_array_equal(np.asarray(valid), [True, True, True, False])

    def test_overflow_truncates(self):
        mask = jnp.ones(10, bool)
        idx, valid = masked_select_first_k(mask, 4)
        assert valid.all()
        np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3])

    def test_k_larger_than_mask_pads_invalid(self):
        """k > len(mask) (e.g. max_input_points > R^3 on small grids) must
        keep idx and valid at the same static length k."""
        mask = jnp.array([False, True, True])
        idx, valid = masked_select_first_k(mask, 8)
        assert idx.shape == (8,) and valid.shape == (8,)
        np.testing.assert_array_equal(np.asarray(idx[:2]), [1, 2])
        np.testing.assert_array_equal(
            np.asarray(valid), [True, True] + [False] * 6)


class TestTransformer:
    def test_cross_encoder_shapes_and_masking(self, key, rng):
        from dregnerf_tpu.models.transformer import TransformerCrossEncoder

        enc = TransformerCrossEncoder(num_layers=2, d_model=32, num_heads=4,
                                      dim_feedforward=64)
        n = 16
        src = jnp.asarray(rng.normal(size=(1, n, 32)), jnp.float32)
        tgt = jnp.asarray(rng.normal(size=(1, n, 32)), jnp.float32)
        pe = jnp.zeros((1, n, 32))
        sv = jnp.arange(n)[None] < 10
        tv = jnp.arange(n)[None] < 12
        params = enc.init(key, src, tgt, sv, tv, pe, pe)
        s_out, t_out = enc.apply(params, src, tgt, sv, tv, pe, pe)
        assert s_out.shape == (2, 1, n, 32)

        # changing PADDING content must not change valid outputs
        src2 = src.at[0, 12:].set(99.0)
        s_out2, _ = enc.apply(params, src2, tgt, sv, tv, pe, pe)
        np.testing.assert_allclose(
            np.asarray(s_out[:, :, :10]), np.asarray(s_out2[:, :, :10]), atol=1e-5
        )


class TestNeRFRegTr:
    @pytest.fixture(scope="class")
    def model_and_data(self):
        from dregnerf_tpu.models.regtr import NeRFRegTr

        rng = np.random.default_rng(0)
        model = NeRFRegTr(
            backbone="resnet18", d_model=64, num_layers=2, num_heads=4,
            dim_feedforward=128, max_input_points=512, num_tokens=128,
            max_points=100, dtype=jnp.float32,
        )
        r = 16
        # structured scene: points on a plane patch, mask from alpha
        def make_grid(pose_offset):
            grid = np.zeros((r, r, r, 7), np.float32)
            mask = np.zeros(r * r * r, bool)
            ii = rng.integers(2, r - 2, size=(200, 3))
            flat = ii[:, 0] * r * r + ii[:, 1] * r + ii[:, 2]
            xyz = (ii + 0.5) / r * 3.0 - 1.5 + pose_offset
            grid.reshape(-1, 7)[flat, :3] = xyz
            grid.reshape(-1, 7)[flat, 3:6] = rng.uniform(size=(200, 3))
            grid.reshape(-1, 7)[flat, 6] = 1.0
            mask[flat] = True
            return jnp.asarray(grid), jnp.asarray(mask)

        sg, sm = make_grid(0.0)
        tg, tm = make_grid(0.1)
        data = {"src_grid": sg, "src_mask": sm, "tgt_grid": tg, "tgt_mask": tm}
        params = model.init(jax.random.PRNGKey(0), data)
        return model, params, data

    def test_forward_shapes(self, model_and_data):
        model, params, data = model_and_data
        out = model.apply(params, data)
        L, N = 2, 128
        assert out["pose"].shape == (L, 3, 4)
        assert out["src_kp_warped"].shape == (L, N, 3)
        assert out["src_overlap"].shape == (L, N)
        assert out["src_feats"].shape == (L, 1, N, 64)
        # poses are valid rigid transforms
        rot = np.asarray(out["pose"][..., :3])
        for l in range(L):
            np.testing.assert_allclose(rot[l] @ rot[l].T, np.eye(3), atol=1e-4)
            np.testing.assert_allclose(np.linalg.det(rot[l]), 1.0, atol=1e-4)

    def test_jit_and_grads(self, model_and_data):
        model, params, data = model_and_data

        @jax.jit
        def loss_fn(p):
            out = model.apply(p, data)
            return jnp.sum(out["pose"] ** 2) + jnp.sum(out["src_overlap"])

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
        assert total > 0

    def test_identity_pair_recovers_identity_ish(self, model_and_data):
        """src == tgt -> warped keypoints live in the same cloud; the pose
        from an UNTRAINED net won't be exact, but translation must be
        bounded by the scene scale (sanity: no wild outputs)."""
        model, params, data = model_and_data
        same = {
            "src_grid": data["src_grid"], "src_mask": data["src_mask"],
            "tgt_grid": data["src_grid"], "tgt_mask": data["src_mask"],
        }
        out = model.apply(params, same)
        t = np.asarray(out["pose"][-1, :, 3])
        assert np.abs(t).max() < 3.0


def test_fpn_v3_variant_for_basic_nets(key):
    """Basic-block archs get the v3 pyramid (3x3x3 c2/c3 laterals,
    reference feature_pyramid_net.py:111-179); bottleneck archs keep v1
    (1x1x1). Both produce the finest 1/2-res out_channels volume."""
    import jax
    import jax.numpy as jnp

    from dregnerf_tpu.models.resnet3d import FeaturePyramid3D

    x = jnp.ones((1, 16, 16, 16, 4))
    for arch, lateral_kernel in [("resnet18", 3), ("resnet50", 1)]:
        fpn = FeaturePyramid3D(arch, out_channels=32)
        params = fpn.init(key, x)["params"]
        k2 = params["lateral2"]["kernel"].shape[0]
        assert k2 == lateral_kernel, (arch, k2)
        out = fpn.apply({"params": params}, x)
        assert out.shape == (1, 8, 8, 8, 32)


class TestGatherTrilinearResized:
    """gather_trilinear_resized must reproduce the dense
    trilinear_resize -> flatten -> gather path exactly (it replaces the
    reference's F.interpolate-then-select with sample-site evaluation;
    conerf/register/nerf_regtr.py:139-147)."""

    @pytest.mark.parametrize("shape,full", [
        ((4, 4, 4), (8, 8, 8)),
        ((3, 5, 4), (7, 9, 11)),   # odd, anisotropic
        ((8, 8, 8), (8, 8, 8)),    # identity scale
    ])
    def test_matches_dense_resize(self, shape, full):
        from dregnerf_tpu.models.regtr import (gather_trilinear_resized,
                                               trilinear_resize)

        rng = np.random.default_rng(0)
        c = 6
        vol = jnp.asarray(rng.normal(size=(1, *shape, c)), jnp.float32)
        n_full = full[0] * full[1] * full[2]
        idx = jnp.asarray(rng.integers(0, n_full, size=64), jnp.int32)

        dense = trilinear_resize(vol, full)[0].reshape(-1, c)[idx]
        sparse = gather_trilinear_resized(vol, full, idx)
        np.testing.assert_allclose(
            np.asarray(sparse), np.asarray(dense), rtol=1e-5, atol=1e-5)

    def test_model_dense_and_sparse_paths_agree(self, key):
        from dregnerf_tpu.models.regtr import NeRFRegTr

        rng = np.random.default_rng(3)
        r = 16
        grid = np.zeros((r, r, r, 7), np.float32)
        mask = np.zeros(r * r * r, bool)
        ii = rng.integers(1, r - 1, size=(150, 3))
        flat = ii[:, 0] * r * r + ii[:, 1] * r + ii[:, 2]
        grid.reshape(-1, 7)[flat, :3] = (ii + 0.5) / r * 3.0 - 1.5
        grid.reshape(-1, 7)[flat, 3:6] = rng.uniform(size=(150, 3))
        grid.reshape(-1, 7)[flat, 6] = 1.0
        mask[flat] = True
        data = {"src_grid": jnp.asarray(grid), "src_mask": jnp.asarray(mask),
                "tgt_grid": jnp.asarray(grid), "tgt_mask": jnp.asarray(mask)}

        kw = dict(backbone="resnet18", d_model=32, num_layers=1, num_heads=4,
                  dim_feedforward=64, max_input_points=256, num_tokens=64,
                  max_points=50, dtype=jnp.float32)
        sparse_model = NeRFRegTr(**kw)
        dense_model = NeRFRegTr(dense_resize=True, **kw)
        params = sparse_model.init(jax.random.PRNGKey(0), data)
        out_s = sparse_model.apply(params, data)
        out_d = dense_model.apply(params, data)
        for k in ("pose", "src_overlap", "src_feats"):
            np.testing.assert_allclose(
                np.asarray(out_s[k]), np.asarray(out_d[k]),
                rtol=1e-4, atol=1e-4, err_msg=k)

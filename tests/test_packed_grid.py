"""Packed-row grid encoding tests (the TPU-fast NGP encoder)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dregnerf_tpu.ops import packed_grid as PG


def small_cfg(**kw):
    d = dict(n_levels=4, log2_table_size=12, base_resolution=4,
             per_level_scale=1.5)
    d.update(kw)
    return PG.PackedGridConfig(**d)


class TestPackedGrid:
    def test_table_sizes(self):
        cfg = PG.PackedGridConfig()
        sizes = cfg.level_table_sizes()
        assert sizes[0] == 16**3
        assert sizes[-1] == 1 << 19
        assert cfg.level_wrapped()[-1] and not cfg.level_wrapped()[0]
        # parameter budget close to tcnn's (~12.2M)
        assert 8e6 < PG.packed_grid_param_count(cfg) < 16e6

    def test_pack_shapes(self, key):
        cfg = small_cfg()
        v = PG.init_packed_grid(key, cfg)
        p = PG.pack_table(v, cfg)
        sizes = cfg.level_table_sizes()
        assert len(p) == cfg.n_levels
        offset = 0
        for l, pl in enumerate(p):
            assert pl.shape == (int(sizes[l]), 8 * cfg.n_features)
            # corner 0 of each row is the row's own vertex features
            np.testing.assert_allclose(
                pl[:, : cfg.n_features], v[offset: offset + int(sizes[l])]
            )
            offset += int(sizes[l])

    def test_matches_numpy_trilinear_dense(self, key, rng):
        """On a dense (unwrapped) level, packed_encode must equal direct
        trilinear interpolation of the vertex grid."""
        cfg = PG.PackedGridConfig(
            n_levels=1, log2_table_size=15, base_resolution=8,
            per_level_scale=1.0, n_features=2,
        )
        v = PG.init_packed_grid(key, cfg)
        res = int(cfg.level_resolutions()[0])
        scale = float(cfg.level_scales()[0])
        grid = np.asarray(v).reshape(res, res, res, 2)  # slot = x*r^2+y*r+z

        x = rng.uniform(0.15, 0.85, (50, 3)).astype(np.float32)
        p = PG.pack_table(v, cfg)
        out = np.asarray(PG.packed_encode(p, jnp.asarray(x), cfg))

        pos = x * scale + 0.5
        pf = np.floor(pos).astype(int)
        fr = pos - pf
        expected = np.zeros((50, 2))
        for c, (dx, dy, dz) in enumerate(PG._CORNERS):
            w = (
                (fr[:, 0] if dx else 1 - fr[:, 0])
                * (fr[:, 1] if dy else 1 - fr[:, 1])
                * (fr[:, 2] if dz else 1 - fr[:, 2])
            )
            expected += w[:, None] * grid[pf[:, 0] + dx, pf[:, 1] + dy, pf[:, 2] + dz]
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_continuity(self, key):
        cfg = small_cfg()
        v = PG.init_packed_grid(key, cfg)
        p = PG.pack_table(v, cfg)
        x = jnp.array([[0.37, 0.52, 0.61]])
        eps = 1e-6
        a = PG.packed_encode(p, x, cfg)
        b = PG.packed_encode(p, x + eps, cfg)
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_continuity_across_cell_boundary(self, key):
        """C0 at exact cell boundaries — the property cell-local layouts
        lose and this layout must keep."""
        cfg = small_cfg(per_level_scale=1.0, base_resolution=8, n_levels=1)
        v = PG.init_packed_grid(key, cfg) * 1000  # amplify
        p = PG.pack_table(v, cfg)
        scale = float(cfg.level_scales()[0])
        # boundary at pos = k  ->  x = (k - 0.5)/scale
        xb = (3.0 - 0.5) / scale
        lo = PG.packed_encode(p, jnp.array([[xb - 1e-5, 0.4, 0.4]]), cfg)
        hi = PG.packed_encode(p, jnp.array([[xb + 1e-5, 0.4, 0.4]]), cfg)
        np.testing.assert_allclose(lo, hi, atol=1e-2)

    def test_grad_flows_to_vertices(self, key):
        cfg = small_cfg()
        v = PG.init_packed_grid(key, cfg)
        x = jax.random.uniform(key, (32, 3))

        def loss(v):
            p = PG.pack_table(v, cfg)
            return jnp.sum(PG.packed_encode(p, x, cfg) ** 2)

        g = jax.grad(loss)(v)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_wrapped_level_in_range(self, key):
        cfg = PG.PackedGridConfig(n_levels=8, log2_table_size=10,
                                  base_resolution=8, per_level_scale=1.6)
        assert cfg.level_wrapped().any()
        v = PG.init_packed_grid(key, cfg)
        p = PG.pack_table(v, cfg)
        x = jax.random.uniform(key, (64, 3))
        out = PG.packed_encode(p, x, cfg)
        assert out.shape == (64, cfg.out_dim)
        assert np.isfinite(np.asarray(out)).all()


class TestNGPPackedIntegration:
    def test_ngp_with_packed_encoder(self, key):
        from dregnerf_tpu.models import ngp

        cfg = ngp.NGPConfig(grid=small_cfg(), compute_dtype=jnp.float32)
        params = ngp.init_ngp(key, cfg)
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        x = jax.random.uniform(key, (32, 3), minval=-0.9, maxval=0.9)
        d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        rgb, dens = ngp.forward(params, x, d, aabb, cfg)
        assert rgb.shape == (32, 3)
        assert np.isfinite(np.asarray(dens)).all()

        # prepared params give identical results
        prepared = ngp.prepare_params(params, cfg)
        assert "packed_table" in prepared
        rgb2, dens2 = ngp.forward(prepared, x, d, aabb, cfg)
        np.testing.assert_allclose(rgb, rgb2, atol=1e-6)

    def test_train_step_reduces_loss_packed(self, key):
        """A few gradient steps on the packed encoder fit a target field."""
        import optax

        from dregnerf_tpu.models import ngp

        cfg = ngp.NGPConfig(grid=small_cfg(), compute_dtype=jnp.float32)
        params = ngp.init_ngp(key, cfg)
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        x = jax.random.uniform(key, (256, 3), minval=-0.9, maxval=0.9)
        target = jnp.exp(-jnp.sum(x**2, -1, keepdims=True) * 3.0) * 5.0

        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss(p):
                d = ngp.query_density(p, x, aabb, cfg)
                return jnp.mean((d - target) ** 2)

            l, g = jax.value_and_grad(loss)(params)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, l

        first = None
        for _ in range(60):
            params, opt_state, l = step(params, opt_state)
            if first is None:
                first = float(l)
        assert float(l) < first * 0.5


def test_rle_backward_matches_plain_gradients():
    """rle_step_u > 0 switches coarse levels to the run-length-compressed
    scatter backward (ops/rle.py); gradients must match the plain
    scatter-add exactly up to f32 summation order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dregnerf_tpu.ops.packed_grid import (PackedGridConfig,
                                              init_packed_grid, pack_table,
                                              packed_encode,
                                              rle_expected_run)

    base = PackedGridConfig(n_levels=4, n_features=2, log2_table_size=10,
                            base_resolution=4, per_level_scale=2.0)
    step_u = 1.0 / 256.0  # coarse levels see long runs
    rle = PackedGridConfig(n_levels=4, n_features=2, log2_table_size=10,
                           base_resolution=4, per_level_scale=2.0,
                           rle_step_u=step_u)
    assert rle_expected_run(rle, 0) > 4.0  # RLE actually active somewhere
    assert rle_expected_run(base, 0) == 0.0

    table = init_packed_grid(jax.random.PRNGKey(0), base)

    # ray-coherent positions: 8 rays x 64 steps
    rng = np.random.default_rng(1)
    o = rng.uniform(0.1, 0.3, (8, 1, 3)).astype(np.float32)
    d = rng.normal(size=(8, 1, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = (np.arange(64, dtype=np.float32) * step_u)[None, :, None]
    x = jnp.asarray((o + d * t).reshape(-1, 3))

    def loss(tbl, cfg):
        out = packed_encode(pack_table(tbl, cfg), x, cfg)
        return jnp.sum(jnp.sin(out) * out)

    g_plain = jax.grad(lambda tb: loss(tb, base))(table)
    g_rle = jax.grad(lambda tb: loss(tb, rle))(table)
    np.testing.assert_allclose(np.asarray(g_rle), np.asarray(g_plain),
                               rtol=2e-5, atol=1e-6)

    # incoherent positions overflow the heuristic -> in-graph fallback,
    # still exact
    xr = jnp.asarray(rng.uniform(0, 1, (512, 3)).astype(np.float32))

    def loss_r(tbl, cfg):
        out = packed_encode(pack_table(tbl, cfg), xr, cfg)
        return jnp.sum(out * out)

    g_plain_r = jax.grad(lambda tb: loss_r(tb, base))(table)
    g_rle_r = jax.grad(lambda tb: loss_r(tb, rle))(table)
    np.testing.assert_allclose(np.asarray(g_rle_r), np.asarray(g_plain_r),
                               rtol=2e-5, atol=1e-6)

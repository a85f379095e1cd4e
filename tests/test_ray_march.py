"""Ray marching + compositing tests against a dense brute-force reference.

SURVEY.md §7 'hard parts': wrong masking silently skews transmittance — so
the packed pipeline is validated numerically against an unmasked dense
renderer on analytic density fields.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dregnerf_tpu.ops import occupancy
from dregnerf_tpu.ops.composite import composite, surface_field_per_ray
from dregnerf_tpu.ops.ray_march import march_rays, sample_positions

AABB = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])


def full_grid(res=32):
    g = occupancy.init_grid(res)
    return g._replace(binary=jnp.ones((res,) * 3, bool))


def sphere_sigma(x, radius=0.5, value=20.0):
    """Constant density inside a centered sphere."""
    inside = jnp.linalg.norm(x, axis=-1) < radius
    return jnp.where(inside, value, 0.0)


def brute_force_render(origins, viewdirs, sigma_fn, rgb_fn, t_lo, t_hi, n=2048):
    """Dense uniform quadrature renderer (numpy reference semantics)."""
    ts = np.linspace(0, 1, n + 1)
    outs_rgb, outs_op, outs_depth = [], [], []
    for o, d, a, b in zip(origins, viewdirs, t_lo, t_hi):
        if b <= a:
            outs_rgb.append(np.zeros(3))
            outs_op.append(0.0)
            outs_depth.append(0.0)
            continue
        t0 = a + ts[:-1] * (b - a)
        t1 = a + ts[1:] * (b - a)
        tm = (t0 + t1) / 2
        x = np.asarray(o)[None] + np.asarray(d)[None] * tm[:, None]
        sigma = np.asarray(sigma_fn(jnp.asarray(x)))
        rgb = np.asarray(rgb_fn(jnp.asarray(x)))
        dt = t1 - t0
        alpha = 1 - np.exp(-sigma * dt)
        trans = np.concatenate([[1.0], np.cumprod(1 - alpha)[:-1]])
        w = alpha * trans
        outs_rgb.append((w[:, None] * rgb).sum(0))
        outs_op.append(w.sum())
        outs_depth.append((w * tm).sum())
    return np.stack(outs_rgb), np.array(outs_op), np.array(outs_depth)


@pytest.fixture
def rays():
    # rays entering the box from z=-3 towards +z through different offsets
    xs = np.linspace(-0.8, 0.8, 7)
    origins = jnp.asarray([[x, 0.1, -3.0] for x in xs], dtype=jnp.float32)
    viewdirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (len(xs), 1))
    return origins, viewdirs


class TestMarching:
    def test_samples_inside_aabb_and_ordered(self, rays):
        o, d = rays
        packed = march_rays(o, d, full_grid(), AABB, "aabb", 0.01, 4096, 512)
        pos, _ = sample_positions(packed, o, d)
        pos = np.asarray(pos)[np.asarray(packed.valid)]
        assert (np.abs(pos) <= 1.0 + 1e-4).all()
        # ray-major + depth-ordered packing
        rid = np.asarray(packed.ray_id)[np.asarray(packed.valid)]
        ts = np.asarray(packed.t_start)[np.asarray(packed.valid)]
        assert (np.diff(rid) >= 0).all()
        for r in np.unique(rid):
            assert (np.diff(ts[rid == r]) > 0).all()

    def test_empty_grid_no_samples(self, rays):
        o, d = rays
        packed = march_rays(o, d, occupancy.init_grid(16), AABB, "aabb", 0.01, 1024, 512)
        assert int(packed.num_samples) == 0
        assert not bool(packed.valid.any())

    def test_occupancy_skipping(self, rays):
        """Only the occupied octant should produce samples."""
        o, d = rays
        res = 16
        binary = jnp.zeros((res,) * 3, bool).at[: res // 2].set(True)  # x < 0 half
        g = occupancy.init_grid(res)._replace(binary=binary)
        packed = march_rays(o, d, g, AABB, "aabb", 0.01, 4096, 512)
        pos, _ = sample_positions(packed, o, d)
        pos = np.asarray(pos)[np.asarray(packed.valid)]
        assert pos.shape[0] > 0
        assert (pos[:, 0] <= 0.0 + 1e-2).all()

    def test_buffer_overflow_truncates_gracefully(self, rays):
        o, d = rays
        packed = march_rays(o, d, full_grid(), AABB, "aabb", 0.01, 64, 512)
        assert int(packed.num_samples) == 64  # capped
        assert bool(packed.valid.all())

    def test_t_max_override(self, rays):
        o, d = rays
        t_max = jnp.full((o.shape[0],), 2.5)  # stop at z = -0.5
        packed = march_rays(
            o, d, full_grid(), AABB, "aabb", 0.01, 4096, 512, t_max=t_max
        )
        ts = np.asarray(packed.t_start)[np.asarray(packed.valid)]
        assert ts.max() <= 2.5 + 0.011


class TestCompositing:
    def test_matches_brute_force_sphere(self, rays):
        o, d = rays
        dt = 2.0 * np.sqrt(3) / 1024
        packed = march_rays(o, d, full_grid(64), AABB, "aabb", dt, 1 << 15, 2048)
        pos, _ = sample_positions(packed, o, d)
        sigmas = jnp.where(packed.valid, sphere_sigma(pos), 0.0)
        rgb_fn = lambda x: jnp.clip(x * 0.5 + 0.5, 0, 1)
        rgbs = rgb_fn(pos)
        out = composite(packed, rgbs, sigmas)

        from dregnerf_tpu.geometry.cameras import ray_aabb_intersect

        t_lo, t_hi = ray_aabb_intersect(o, d, AABB)
        ref_rgb, ref_op, ref_depth = brute_force_render(
            np.asarray(o), np.asarray(d), sphere_sigma, rgb_fn,
            np.asarray(t_lo), np.asarray(t_hi), n=4096,
        )
        np.testing.assert_allclose(out.rgb, ref_rgb, atol=2e-2)
        np.testing.assert_allclose(out.opacity, ref_op, atol=2e-2)
        np.testing.assert_allclose(out.depth, ref_depth, atol=3e-2)

    def test_opaque_wall_opacity_one(self):
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        packed = march_rays(o, d, full_grid(), AABB, "aabb", 0.005, 2048, 1024)
        pos, _ = sample_positions(packed, o, d)
        sigmas = jnp.where(packed.valid, 1e4, 0.0)
        out = composite(packed, jnp.ones((2048, 3)), sigmas)
        np.testing.assert_allclose(out.opacity, 1.0, atol=1e-4)
        np.testing.assert_allclose(out.rgb[0], [1.0, 1.0, 1.0], atol=1e-4)
        # depth = first hit (front of box)
        np.testing.assert_allclose(out.depth[0], 2.0, atol=0.02)

    def test_background_composited(self):
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        packed = march_rays(o, d, occupancy.init_grid(8), AABB, "aabb", 0.01, 256, 512)
        out = composite(
            packed, jnp.zeros((256, 3)), jnp.zeros(256), background=jnp.ones(3)
        )
        np.testing.assert_allclose(out.rgb[0], [1.0, 1.0, 1.0])

    def test_two_rays_independent_transmittance(self):
        """Transmittance must re-base per ray: a dense ray must not dim the next."""
        o = jnp.array([[0.0, 0.0, -3.0], [0.3, 0.0, -3.0]])
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
        packed = march_rays(o, d, full_grid(), AABB, "aabb", 0.01, 2048, 512)
        sigmas = jnp.where(
            packed.valid & (packed.ray_id == 0), 1e4, jnp.where(packed.valid, 1.0, 0.0)
        )
        out = composite(packed, jnp.ones((2048, 3)), sigmas)
        # ray 1 transmittance must start at 1 regardless of opaque ray 0
        trans1 = np.asarray(out.transmittance)[np.asarray(packed.ray_id) == 1]
        assert trans1.size > 0
        np.testing.assert_allclose(trans1[0], 1.0, atol=1e-5)

    def test_surface_field(self):
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        packed = march_rays(o, d, full_grid(), AABB, "aabb", 0.01, 2048, 512)
        pos, _ = sample_positions(packed, o, d)
        sigmas = jnp.where(packed.valid, sphere_sigma(pos, value=200.0), 0.0)
        s = surface_field_per_ray(packed, sigmas)
        assert s.shape == (1,)
        assert 0.5 < float(s[0]) <= 1.0  # hard surface -> S near 1

    def test_empty_ray_surface_field_zero(self):
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        packed = march_rays(o, d, occupancy.init_grid(8), AABB, "aabb", 0.01, 64, 128)
        s = surface_field_per_ray(packed, jnp.zeros(64))
        np.testing.assert_allclose(s, 0.0)

    def test_surface_field_rows_matches_packed(self, key):
        """The extraction path's row-layout surface field must equal the
        segment-keyed packed one: same first-K-survivors content (capped
        flat vs rows), same S = max T*alpha (round-4 layout switch)."""
        from dregnerf_tpu.ops.composite import surface_field_rows
        from dregnerf_tpu.ops.ray_march import (
            march_rays_rows, row_sample_positions)

        n = 16
        o = jnp.stack([
            jnp.linspace(-0.4, 0.4, n), jnp.full((n,), -0.2),
            jnp.full((n,), -3.0)], axis=-1)
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        t_max = jnp.full((n,), 5.0)
        # k must cover entry->surface: full grid means the first k survivors
        # start at the AABB boundary (z=-1.5); 256 x 0.01 steps reach z=+1.06
        k = 256
        packed = march_rays(
            o, d, full_grid(), AABB, "aabb", 0.01, n * k, 512,
            t_max=t_max, compaction="capped", k_cap=k,
        )
        pos_p, _ = sample_positions(packed, o, d)
        sig_p = jnp.where(packed.valid, sphere_sigma(pos_p, value=30.0), 0.0)
        s_packed = surface_field_per_ray(packed, sig_p)

        rows = march_rays_rows(
            o, d, full_grid(), AABB, "aabb", 0.01, k, 512, t_max=t_max)
        pos_r, _ = row_sample_positions(rows, o, d)
        sig_r = jnp.where(
            rows.valid,
            sphere_sigma(pos_r.reshape(-1, 3), value=30.0).reshape(rows.valid.shape),
            0.0,
        )
        s_rows = surface_field_rows(rows, sig_r)
        np.testing.assert_allclose(
            np.asarray(s_rows), np.asarray(s_packed), rtol=1e-5, atol=1e-6)
        assert float(jnp.max(s_rows)) > 0.1  # the comparison is non-trivial


class TestOccupancyUpdate:
    def test_update_marks_dense_region(self, key):
        g = occupancy.init_grid(16)

        def occ_fn(u):
            # occupied where contracted x < 0.5
            return jnp.where(u[..., 0] < 0.5, 1.0, 0.0)

        g = occupancy.update_grid(g, key, occ_fn, warmup=True)
        b = np.asarray(g.binary)
        assert b[:7].all()
        assert not b[9:].any()

    def test_ema_decay_clears_stale(self, key):
        g = occupancy.init_grid(8)
        hot = lambda u: jnp.ones(u.shape[:-1])
        cold = lambda u: jnp.zeros(u.shape[:-1])
        g = occupancy.update_grid(g, key, hot, warmup=True)
        assert np.asarray(g.binary).all()
        for i in range(300):
            g = occupancy.update_grid(g, jax.random.fold_in(key, i), cold, warmup=True)
        assert not np.asarray(g.binary).any()

    def test_sampled_update_static_shape(self, key):
        g = occupancy.init_grid(16)
        fn = lambda u: jnp.ones(u.shape[:-1])
        g = occupancy.update_grid(g, key, fn, warmup=True)
        jitted = jax.jit(
            lambda g, k: occupancy.update_grid(g, k, fn, warmup=False, n_samples=128)
        )
        g2 = jitted(g, key)
        assert g2.occs.shape == g.occs.shape


class TestRenderer:
    def test_render_rays_and_chunked_agree(self, key):
        from dregnerf_tpu.models import ngp as ngp_mod
        from dregnerf_tpu.render.renderer import RenderConfig, render_rays, render_image_chunked
        from dregnerf_tpu.ops.hash_encoding import HashGridConfig

        cfg = ngp_mod.NGPConfig(
            grid=HashGridConfig(n_levels=2, log2_table_size=8),
            compute_dtype=jnp.float32,
        )
        params = ngp_mod.init_ngp(key, cfg)
        rcfg = RenderConfig(
            render_step_size=0.05, buffer_size=4096, max_steps=128, chunk_size=8
        )
        aabb = AABB
        g = full_grid(8)
        o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (20, 1))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (20, 1))
        bg = jnp.ones(3)
        out, n = render_rays(params, cfg, g, o, d, aabb, rcfg, background=bg)
        rgb2, op2, _ = render_image_chunked(params, cfg, g, o, d, aabb, rcfg, bg)
        np.testing.assert_allclose(out.rgb, rgb2, atol=1e-5)

    def test_hostloop_dispatch_matches_scan(self, key):
        """image_dispatch="hostloop" (independent per-chunk dispatches)
        must match the lax.map scan bit-for-bit — same chunk program,
        different execution schedule (probe_render_dispatch.py races the
        two on TPU)."""
        import dataclasses as dc

        from dregnerf_tpu.models import ngp as ngp_mod
        from dregnerf_tpu.ops.hash_encoding import HashGridConfig
        from dregnerf_tpu.render.renderer import (
            RenderConfig, render_image_chunked)

        cfg = ngp_mod.NGPConfig(
            grid=HashGridConfig(n_levels=2, log2_table_size=8),
            compute_dtype=jnp.float32,
        )
        params = ngp_mod.init_ngp(key, cfg)
        rcfg = RenderConfig(
            render_step_size=0.05, buffer_size=4096, max_steps=128,
            chunk_size=8, march_compaction="rows",
        )
        g = full_grid(8)
        ks = jax.random.split(key, 2)
        o = jax.random.uniform(ks[0], (21, 3), minval=-0.3, maxval=0.3) \
            + jnp.array([0.0, 0.0, -3.0])
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (21, 1))
        bg = jnp.ones(3)
        rgb_s, op_s, dep_s = render_image_chunked(
            params, cfg, g, o, d, AABB, rcfg, bg)
        rcfg_h = dc.replace(rcfg, image_dispatch="hostloop")
        rgb_h, op_h, dep_h = render_image_chunked(
            params, cfg, g, o, d, AABB, rcfg_h, bg)
        np.testing.assert_allclose(rgb_s, rgb_h, atol=1e-6)
        np.testing.assert_allclose(op_s, op_h, atol=1e-6)
        np.testing.assert_allclose(dep_s, dep_h, atol=1e-6)


class TestQuotaCompaction:
    def test_quota_matches_compact_render(self, key):
        """Quota-mode marching must produce the same per-ray composite as
        compact mode when no ray exceeds its quota."""
        from dregnerf_tpu.ops.composite import composite
        from dregnerf_tpu.ops.ray_march import march_rays, sample_positions

        grid = full_grid(16)
        n = 8
        o = jnp.asarray([[x, 0.05, -3.0] for x in np.linspace(-0.5, 0.5, n)],
                        jnp.float32)
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        outs = {}
        for mode in ("compact", "quota"):
            packed = march_rays(o, d, grid, AABB, "aabb", 0.01, n * 256, 224,
                                compaction=mode)
            pos, _ = sample_positions(packed, o, d)
            sig = jnp.where(packed.valid, sphere_sigma(pos), 0.0)
            rgbs = jnp.clip(pos * 0.5 + 0.5, 0, 1)
            outs[mode] = composite(packed, rgbs, sig)
        np.testing.assert_allclose(outs["quota"].rgb, outs["compact"].rgb,
                                   atol=1e-4)
        np.testing.assert_allclose(outs["quota"].opacity,
                                   outs["compact"].opacity, atol=1e-4)
        np.testing.assert_allclose(outs["quota"].depth,
                                   outs["compact"].depth, atol=1e-4)

    def test_quota_truncates_per_ray(self):
        from dregnerf_tpu.ops.ray_march import march_rays

        grid = full_grid(16)
        o = jnp.array([[0.0, 0.0, -3.0], [0.3, 0.0, -3.0]])
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
        packed = march_rays(o, d, grid, AABB, "aabb", 0.01, 2 * 16, 224,
                            compaction="quota")
        rid = np.asarray(packed.ray_id)[np.asarray(packed.valid)]
        # both rays represented despite truncation (global cut would starve
        # ray 1)
        assert set(np.unique(rid)) == {0, 1}
        assert (np.bincount(rid) <= 16).all()


class TestRowMarch:
    """Row-packed marching (RowSamples) vs the quota/flat paths."""

    def _scene(self, key, res=32, occ=0.3, n=64):
        import jax

        from dregnerf_tpu.ops import occupancy

        binary = jax.random.uniform(key, (res, res, res)) < occ
        grid = occupancy.init_grid(res)._replace(binary=binary)
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        k1, k2 = jax.random.split(key)
        origins = jax.random.uniform(k1, (n, 3), minval=-3.0, maxval=-2.5)
        viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)
        return grid, aabb, origins, viewdirs

    def test_rows_match_quota_selection(self, key):
        """Same group span -> identical live sample sets and t values."""
        import numpy as np

        from dregnerf_tpu.ops.ray_march import march_rays, march_rays_rows

        grid, aabb, o, d = self._scene(key)
        step, S, K = 0.02, 128, 16
        rows = march_rays_rows(
            o, d, grid, aabb, "aabb", step, K, S, group_span_cells=1.5
        )
        flat = march_rays(
            o, d, grid, aabb, "aabb", step, K * o.shape[0], S,
            compaction="quota",
        )
        n = o.shape[0]
        t_flat = np.asarray(flat.t_start[: n * K]).reshape(n, K)
        v_flat = np.asarray(flat.valid[: n * K]).reshape(n, K)
        np.testing.assert_array_equal(np.asarray(rows.valid), v_flat)
        np.testing.assert_allclose(
            np.asarray(rows.t_start) * v_flat, t_flat * v_flat, atol=1e-6
        )
        assert int(rows.num_samples) == int(flat.num_samples)

    def test_rows_depth_ordered_and_occupied(self, key):
        import numpy as np

        from dregnerf_tpu.ops.ray_march import march_rays_rows

        grid, aabb, o, d = self._scene(key)
        rows = march_rays_rows(o, d, grid, aabb, "aabb", 0.02, 16, 128)
        t = np.asarray(rows.t_start)
        v = np.asarray(rows.valid)
        for r in range(t.shape[0]):
            tv = t[r][v[r]]
            assert (np.diff(tv) > 0).all()  # strictly increasing depth
        # padding trails validity
        first_invalid = np.argmin(v, axis=1)
        for r in range(v.shape[0]):
            if not v[r].all():
                assert not v[r][first_invalid[r]:].any()

    def test_rows_respect_t_max(self, key):
        import numpy as np

        from dregnerf_tpu.ops.ray_march import march_rays_rows

        grid, aabb, o, d = self._scene(key, occ=1.0)
        t_max = jnp.full((o.shape[0],), 2.2)
        rows = march_rays_rows(
            o, d, grid, aabb, "aabb", 0.02, 32, 128, t_max=t_max
        )
        t_mid = np.asarray(rows.t_start) + 0.01
        v = np.asarray(rows.valid)
        assert (t_mid[v] < 2.2).all()

    def test_render_rows_matches_quota_full_grid(self, key):
        """Full render equivalence on an all-occupied grid (span-independent
        masks): rows path == quota path rgb/opacity/depth."""
        import dataclasses

        import numpy as np

        from dregnerf_tpu.models import ngp
        from dregnerf_tpu.ops.packed_grid import PackedGridConfig
        from dregnerf_tpu.render.renderer import RenderConfig, render_rays

        grid, aabb, o, d = self._scene(key, occ=2.0)  # all occupied
        cfg = ngp.NGPConfig(
            grid=PackedGridConfig(n_levels=2, log2_table_size=8),
            compute_dtype=jnp.float32,
        )
        params = ngp.init_ngp(key, cfg)
        rcfg = RenderConfig(
            render_step_size=0.02, buffer_size=64 * 32, max_steps=128,
            march_compaction="rows",
        )
        out_r, aux_r = render_rays(
            params, cfg, grid, o, d, aabb, rcfg, background=jnp.ones(3)
        )
        out_q, aux_q = render_rays(
            params, cfg, grid, o, d, aabb,
            dataclasses.replace(rcfg, march_compaction="quota"),
            background=jnp.ones(3),
        )
        assert int(aux_r["n_samples"]) == int(aux_q["n_samples"])
        np.testing.assert_array_equal(
            np.asarray(aux_r["ray_counts"]), np.asarray(aux_q["ray_counts"])
        )
        np.testing.assert_allclose(
            np.asarray(out_r.rgb), np.asarray(out_q.rgb), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_r.opacity), np.asarray(out_q.opacity), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_r.depth), np.asarray(out_q.depth), atol=2e-4
        )

    def test_composite_rows_matches_packed(self, key):
        """composite_rows == composite on the equivalent flat buffer."""
        import jax
        import numpy as np

        from dregnerf_tpu.ops.composite import composite, composite_rows
        from dregnerf_tpu.ops.ray_march import PackedSamples, RowSamples

        R, K, dt = 8, 16, 0.05
        k1, k2, k3 = jax.random.split(key, 3)
        t0 = jnp.cumsum(jax.random.uniform(k1, (R, K)) * 0.1, axis=1)
        counts = jax.random.randint(k2, (R,), 0, K + 1)
        valid = jnp.arange(K)[None, :] < counts[:, None]
        sig = jax.random.uniform(k3, (R, K)) * 30
        rgbs = jax.random.uniform(key, (R, K, 3))

        rows = RowSamples(
            t_start=jnp.where(valid, t0, 0.0), dt=dt, valid=valid,
            num_samples=valid.sum(),
        )
        out_r = composite_rows(rows, rgbs, sig, background=jnp.ones(3))

        ray_id = jnp.where(
            valid, jnp.arange(R, dtype=jnp.int32)[:, None], R
        ).reshape(-1)
        packed = PackedSamples(
            ray_id=ray_id,
            t_start=rows.t_start.reshape(-1),
            t_end=rows.t_start.reshape(-1) + dt,
            valid=valid.reshape(-1),
            num_samples=valid.sum(),
            num_rays=R,
        )
        out_p = composite(
            packed, rgbs.reshape(-1, 3),
            jnp.where(valid, sig, 0.0).reshape(-1), background=jnp.ones(3),
        )
        np.testing.assert_allclose(
            np.asarray(out_r.rgb), np.asarray(out_p.rgb), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_r.opacity), np.asarray(out_p.opacity), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_r.depth), np.asarray(out_p.depth), atol=1e-5
        )


def test_render_rows_with_times_dnerf(key):
    """rows path + per-ray timestamps (D-NeRF fields) runs and matches the
    quota path on an all-occupied grid."""
    import dataclasses

    import numpy as np

    from dregnerf_tpu.models import fields
    from dregnerf_tpu.models.mlp_nerf import VanillaNeRFConfig
    from dregnerf_tpu.ops import occupancy
    from dregnerf_tpu.render.renderer import RenderConfig, render_rays

    cfg = VanillaNeRFConfig(
        warp=True, net_depth=1, net_width=16, posenc_xyz=2, posenc_dir=2,
        posenc_time=2, compute_dtype=jnp.float32,
    )
    field = fields.get_field("dnerf")
    params = field.init(key, cfg)
    grid = occupancy.init_grid(8)._replace(binary=jnp.ones((8,) * 3, bool))
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    n = 32
    k1, _ = jax.random.split(key)
    origins = jax.random.uniform(k1, (n, 3), minval=-3.0, maxval=-2.5)
    viewdirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)
    times = jnp.linspace(0, 1, n)
    rcfg = RenderConfig(render_step_size=0.05, buffer_size=n * 32,
                        max_steps=64, march_compaction="rows")
    out_r, aux_r = render_rays(params, cfg, grid, origins, viewdirs, aabb,
                               rcfg, background=jnp.ones(3), field=field,
                               times=times)
    out_q, aux_q = render_rays(params, cfg, grid, origins, viewdirs, aabb,
                               dataclasses.replace(rcfg, march_compaction="quota"),
                               background=jnp.ones(3), field=field,
                               times=times)
    assert int(aux_r["n_samples"]) == int(aux_q["n_samples"])
    np.testing.assert_allclose(np.asarray(out_r.rgb), np.asarray(out_q.rgb),
                               atol=2e-5)


class TestCappedCompaction:
    """compaction='capped': budget semantics via per-row top_k + row
    offsets (no global candidate searchsorted)."""

    def _scene(self, key, n=48, occ=2.0, res=16):
        from dregnerf_tpu.ops import occupancy

        binary = jax.random.uniform(key, (res, res, res)) < occ
        grid = occupancy.init_grid(res)._replace(binary=binary)
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        k1, _ = jax.random.split(key)
        o = jax.random.uniform(k1, (n, 3), minval=-3.0, maxval=-2.5)
        d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
        return grid, aabb, o, d

    def test_capped_equals_compact_when_unconstrained(self, key):
        """All-occupied grid (span-independent mask), max_steps <= K_cap,
        big buffer: capped == compact bit-for-bit (same flat layout)."""
        import numpy as np

        from dregnerf_tpu.ops.ray_march import march_rays

        grid, aabb, o, d = self._scene(key)
        kw = dict(contraction="aabb", render_step_size=0.05,
                  buffer_size=1 << 13, max_steps=64)
        a = march_rays(o, d, grid, aabb, kw["contraction"],
                       kw["render_step_size"], kw["buffer_size"],
                       kw["max_steps"], compaction="capped")
        b = march_rays(o, d, grid, aabb, kw["contraction"],
                       kw["render_step_size"], kw["buffer_size"],
                       kw["max_steps"], compaction="compact")
        assert int(a.num_samples) == int(b.num_samples)
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        np.testing.assert_array_equal(np.asarray(a.ray_id), np.asarray(b.ray_id))
        np.testing.assert_allclose(
            np.asarray(a.t_start), np.asarray(b.t_start), atol=1e-6)

    def test_capped_buffer_cut(self, key):
        import numpy as np

        from dregnerf_tpu.ops.ray_march import march_rays

        grid, aabb, o, d = self._scene(key)
        p = march_rays(o, d, grid, aabb, "aabb", 0.05, 256, 64,
                       compaction="capped")
        assert int(p.num_samples) == 256
        assert int(np.asarray(p.valid).sum()) == 256
        # ray-major ordering preserved
        rid = np.asarray(p.ray_id)[np.asarray(p.valid)]
        assert (np.diff(rid) >= 0).all()

    def test_capped_renders_close_to_compact(self, key):
        """Full render via renderer: capped vs compact rgb close (identical
        when unconstrained)."""
        import dataclasses

        import numpy as np

        from dregnerf_tpu.models import ngp
        from dregnerf_tpu.ops.packed_grid import PackedGridConfig
        from dregnerf_tpu.render.renderer import RenderConfig, render_rays

        grid, aabb, o, d = self._scene(key)
        cfg = ngp.NGPConfig(
            grid=PackedGridConfig(n_levels=2, log2_table_size=8),
            compute_dtype=jnp.float32,
        )
        params = ngp.init_ngp(key, cfg)
        rcfg = RenderConfig(render_step_size=0.05, buffer_size=1 << 13,
                            max_steps=64, march_compaction="capped")
        out_a, aux_a = render_rays(params, cfg, grid, o, d, aabb, rcfg,
                                   background=jnp.ones(3))
        out_b, aux_b = render_rays(
            params, cfg, grid, o, d, aabb,
            dataclasses.replace(rcfg, march_compaction="compact"),
            background=jnp.ones(3))
        assert int(aux_a["n_samples"]) == int(aux_b["n_samples"])
        np.testing.assert_allclose(np.asarray(out_a.rgb),
                                   np.asarray(out_b.rgb), atol=2e-5)


def test_bf16_grad_accum_close_to_f32(key):
    """PackedGridConfig(grad_accum='bf16'): table gradient close to the
    exact f32 scatter (tcnn-style reduced-precision accumulation)."""
    import numpy as np

    from dregnerf_tpu.ops import packed_grid as PG

    base = dict(n_levels=2, log2_table_size=10, base_resolution=4,
                per_level_scale=2.0)
    cfg32 = PG.PackedGridConfig(**base)
    cfg16 = PG.PackedGridConfig(**base, grad_accum="bf16")
    v = PG.init_packed_grid(key, cfg32) * 1000.0  # O(0.1) features
    x = jax.random.uniform(jax.random.fold_in(key, 1), (512, 3))

    def loss(table, cfg):
        p = PG.pack_table(table, cfg)
        return jnp.sum(PG.packed_encode(p, x, cfg) ** 2)

    g32 = jax.grad(lambda t: loss(t, cfg32))(v)
    g16 = jax.grad(lambda t: loss(t, cfg16))(v)
    assert g16.dtype == jnp.float32
    denom = np.abs(np.asarray(g32)).max()
    np.testing.assert_allclose(
        np.asarray(g16), np.asarray(g32), atol=0.02 * denom)


def test_sorted_grad_accum_matches_f32(key):
    """grad_accum='sorted' (argsort + indices_are_sorted scatter,
    probe_pallas_scatter.py) computes the SAME f32 sums as the plain
    scatter up to summation order; 'sorted_bf16' tracks the bf16 path."""
    import numpy as np

    from dregnerf_tpu.ops import packed_grid as PG

    base = dict(n_levels=2, log2_table_size=10, base_resolution=4,
                per_level_scale=2.0)
    cfg32 = PG.PackedGridConfig(**base)
    v = PG.init_packed_grid(key, cfg32) * 1000.0
    x = jax.random.uniform(jax.random.fold_in(key, 1), (512, 3))

    def loss(table, cfg):
        p = PG.pack_table(table, cfg)
        return jnp.sum(PG.packed_encode(p, x, cfg) ** 2)

    g32 = jax.grad(lambda t: loss(t, cfg32))(v)
    gs = jax.grad(lambda t: loss(
        t, PG.PackedGridConfig(**base, grad_accum="sorted")))(v)
    assert gs.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(gs), np.asarray(g32),
                               rtol=1e-5, atol=1e-6)
    gsb = jax.grad(lambda t: loss(
        t, PG.PackedGridConfig(**base, grad_accum="sorted_bf16")))(v)
    denom = np.abs(np.asarray(g32)).max()
    np.testing.assert_allclose(np.asarray(gsb), np.asarray(g32),
                               atol=0.02 * denom)


def test_pallas_grad_accum_matches_f32(key):
    """grad_accum='pallas' (bucketed VMEM scatter, interpret mode on CPU)
    must match the exact f32 XLA scatter to summation-order tolerance."""
    import numpy as np

    from dregnerf_tpu.ops import packed_grid as PG

    base = dict(n_levels=2, log2_table_size=10, base_resolution=4,
                per_level_scale=2.0)
    cfg32 = PG.PackedGridConfig(**base)
    cfgp = PG.PackedGridConfig(**base, grad_accum="pallas")
    v = PG.init_packed_grid(key, cfg32) * 1000.0
    x = jax.random.uniform(jax.random.fold_in(key, 1), (512, 3))

    def loss(table, cfg):
        p = PG.pack_table(table, cfg)
        return jnp.sum(PG.packed_encode(p, x, cfg) ** 2)

    g32 = jax.grad(lambda t: loss(t, cfg32))(v)
    gp = jax.grad(lambda t: loss(t, cfgp))(v)
    assert gp.dtype == jnp.float32
    denom = np.abs(np.asarray(g32)).max()
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(g32), atol=1e-4 * denom)


def test_bucketed_scatter_add_unit():
    """ops/pallas_scatter.bucketed_scatter_add == .at[idx].add, including
    non-shard-divisible table sizes and empty shards."""
    import numpy as np

    from dregnerf_tpu.ops.pallas_scatter import bucketed_scatter_add

    rng = np.random.default_rng(0)
    for t, shard, chunk in [(4913, 1024, 64), (4096, 512, 128),
                            (300, 4096, 64)]:
        idx = jnp.asarray(rng.integers(0, t, size=1000), jnp.int32)
        src = jnp.asarray(rng.normal(size=(1000, 8)), jnp.float32)
        ref = jnp.zeros((t, 8), jnp.float32).at[idx].add(src)
        out = bucketed_scatter_add(
            idx, src, table_rows=t, shard_rows=shard, chunk=chunk)
        assert out.shape == (t, 8)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_capped_k512_equals_compact_under_buffer_cut(key):
    """Round-3 trainer default: with k_cap >= every ray's survivor count,
    capped == compact EXACTLY even when the shared buffer cut is active
    (the 256-cap truncated central rays' exit shells and cost 0.5 dB —
    quality_train_marching round 3)."""
    import numpy as np

    from dregnerf_tpu.ops import occupancy
    from dregnerf_tpu.ops.ray_march import march_rays

    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    res = 16
    binary = jax.random.uniform(key, (res, res, res)) < 0.6
    grid = occupancy.init_grid(res)._replace(binary=binary)
    n = 64
    o = jnp.stack(
        [jnp.linspace(-0.8, 0.8, n), jnp.full((n,), -0.5), jnp.full((n,), -3.0)],
        axis=-1,
    )
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    # buffer far smaller than total survivors => the cut is ACTIVE
    kw = dict(buffer_size=512, max_steps=128)
    a = march_rays(o, d, grid, aabb, "aabb", 0.02, kw["buffer_size"],
                   kw["max_steps"], compaction="capped", k_cap=128)
    b = march_rays(o, d, grid, aabb, "aabb", 0.02, kw["buffer_size"],
                   kw["max_steps"], compaction="compact")
    assert int(a.num_samples) == int(b.num_samples) == 512
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.ray_id), np.asarray(b.ray_id))
    np.testing.assert_allclose(
        np.asarray(a.t_start), np.asarray(b.t_start), atol=1e-6)


def test_pipelined_render_matches_chunked(key):
    """render_image_pipelined == render_image_chunked (rows mode), with a
    non-multiple-of-chunk ray count (exercises padding) and a single-chunk
    case (scan over zero iterations)."""
    import jax
    import numpy as np

    from dregnerf_tpu.models import ngp
    from dregnerf_tpu.ops import occupancy
    from dregnerf_tpu.ops.packed_grid import PackedGridConfig
    from dregnerf_tpu.render.renderer import (
        RenderConfig, render_image_chunked, render_image_pipelined)

    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    binary = jax.random.uniform(key, (16, 16, 16)) < 0.5
    grid = occupancy.init_grid(16)._replace(binary=binary)
    cfg = ngp.NGPConfig(
        grid=PackedGridConfig(n_levels=2, log2_table_size=8),
        compute_dtype=jnp.float32,
    )
    params = ngp.init_ngp(key, cfg)
    rcfg = RenderConfig(
        render_step_size=0.05, buffer_size=32 * 64, max_steps=64,
        chunk_size=32, march_compaction="rows",
    )
    k1, _ = jax.random.split(key)
    for n in (90, 24):  # 3 chunks with padding, and single-chunk
        o = jax.random.uniform(k1, (n, 3), minval=-3.0, maxval=-2.5)
        d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
        bg = jnp.ones(3)
        rgb_c, op_c, dep_c = render_image_chunked(
            params, cfg, grid, o, d, aabb, rcfg, bg)
        rgb_p, op_p, dep_p = render_image_pipelined(
            params, cfg, grid, o, d, aabb, rcfg, bg)
        np.testing.assert_allclose(
            np.asarray(rgb_c), np.asarray(rgb_p), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(op_c), np.asarray(op_p), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(dep_c), np.asarray(dep_p), atol=2e-4)

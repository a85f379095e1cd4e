import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dregnerf_tpu.ops import activation, contraction, hash_encoding, sh
from dregnerf_tpu.ops.hash_encoding import HashGridConfig


class TestTruncExp:
    def test_forward(self):
        x = jnp.array([-1.0, 0.0, 2.0])
        np.testing.assert_allclose(activation.trunc_exp(x), np.exp(x), rtol=1e-6)

    def test_backward_clamped(self):
        g = jax.grad(lambda x: activation.trunc_exp(x))(jnp.array(20.0))
        np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-5)
        g2 = jax.grad(lambda x: activation.trunc_exp(x))(jnp.array(3.0))
        np.testing.assert_allclose(g2, np.exp(3.0), rtol=1e-5)


class TestContraction:
    def test_aabb_roundtrip(self, rng):
        aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
        x = jnp.asarray(rng.uniform(-1.4, 1.4, size=(20, 3)), jnp.float32)
        u = contraction.contract_aabb(x, aabb)
        assert np.all((np.asarray(u) >= 0) & (np.asarray(u) <= 1))
        np.testing.assert_allclose(contraction.contract_aabb_inv(u, aabb), x, atol=1e-5)

    def test_unisphere_inside_is_linearish(self):
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        x = jnp.array([[0.2, -0.3, 0.1]])
        u = contraction.contract_unisphere(x, aabb)
        np.testing.assert_allclose(u, x / 4.0 + 0.5, atol=1e-6)

    def test_unisphere_roundtrip(self, rng):
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        x = jnp.asarray(rng.uniform(-3, 3, size=(50, 3)), jnp.float32)
        u = contraction.contract_unisphere(x, aabb)
        assert np.all((np.asarray(u) >= 0) & (np.asarray(u) <= 1))
        back = contraction.contract_unisphere_inv(u, aabb)
        np.testing.assert_allclose(back, x, atol=1e-4)


class TestSH:
    def test_dc_term(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        out = sh.sh_encode(d, 1)
        np.testing.assert_allclose(out, [[0.28209479]], rtol=1e-5)

    def test_shape(self, rng):
        d = rng.normal(size=(10, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        out = sh.sh_encode(jnp.asarray(d), 4)
        assert out.shape == (10, 16)

    def test_orthonormality(self, rng):
        """Monte-carlo check: int Y_i Y_j dOmega = delta_ij / (4 pi) scaled."""
        n = 200_000
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        y = np.asarray(sh.sh_encode(jnp.asarray(d), 4))
        gram = (y.T @ y) / n * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


class TestHashEncoding:
    def test_shapes_and_dtype(self, key):
        cfg = HashGridConfig(n_levels=4, log2_table_size=10, base_resolution=4)
        table = hash_encoding.init_hash_table(key, cfg)
        assert table.shape == (4 * 1024, 2)
        x = jax.random.uniform(key, (33, 3))
        out = hash_encoding.hash_encode(table, x, cfg)
        assert out.shape == (33, 8)
        assert out.dtype == jnp.float32

    def test_dense_levels_flagged(self):
        cfg = HashGridConfig()  # default instant-ngp sizing
        dense = cfg.level_is_dense()
        assert dense[0] and dense[4]
        assert not dense[8] and not dense[-1]

    def test_interpolation_continuity(self, key):
        """Encoding must be continuous: nearby points -> nearby features."""
        cfg = HashGridConfig(n_levels=8, log2_table_size=12)
        table = hash_encoding.init_hash_table(key, cfg)
        x = jnp.array([[0.5, 0.5, 0.5]])
        eps = 1e-6
        a = hash_encoding.hash_encode(table, x, cfg)
        b = hash_encoding.hash_encode(table, x + eps, cfg)
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_grad_flows_to_table(self, key):
        cfg = HashGridConfig(n_levels=2, log2_table_size=8, base_resolution=4)
        table = hash_encoding.init_hash_table(key, cfg)
        x = jax.random.uniform(key, (16, 3))

        g = jax.grad(lambda t: jnp.sum(hash_encoding.hash_encode(t, x, cfg) ** 2))(
            table
        )
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_deterministic_under_jit(self, key):
        cfg = HashGridConfig(n_levels=4, log2_table_size=10)
        table = hash_encoding.init_hash_table(key, cfg)
        x = jax.random.uniform(key, (64, 3))
        eager = hash_encoding.hash_encode(table, x, cfg)
        jitted = jax.jit(lambda t, p: hash_encoding.hash_encode(t, p, cfg))(table, x)
        np.testing.assert_allclose(eager, jitted, atol=1e-6)


class TestNGPModel:
    def test_density_and_rgb_shapes(self, key):
        from dregnerf_tpu.models import ngp

        cfg = ngp.NGPConfig(
            grid=HashGridConfig(n_levels=4, log2_table_size=10),
            compute_dtype=jnp.float32,
        )
        params = ngp.init_ngp(key, cfg)
        aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
        x = jax.random.uniform(key, (40, 3), minval=-1.0, maxval=1.0)
        d = jax.random.normal(key, (40, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rgb, density = ngp.forward(params, x, d, aabb, cfg)
        assert rgb.shape == (40, 3)
        assert density.shape == (40, 1)
        assert np.all(np.asarray(density) >= 0)
        assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))

    def test_out_of_box_density_zero(self, key):
        from dregnerf_tpu.models import ngp

        cfg = ngp.NGPConfig(
            grid=HashGridConfig(n_levels=2, log2_table_size=8),
            compute_dtype=jnp.float32,
        )
        params = ngp.init_ngp(key, cfg)
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        x = jnp.array([[5.0, 5.0, 5.0]])
        d = ngp.query_density(params, x, aabb, cfg)
        np.testing.assert_allclose(d, 0.0)

    def test_grads_finite(self, key):
        from dregnerf_tpu.models import ngp

        cfg = ngp.NGPConfig(
            grid=HashGridConfig(n_levels=2, log2_table_size=8),
            compute_dtype=jnp.float32,
        )
        params = ngp.init_ngp(key, cfg)
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        x = jax.random.uniform(key, (32, 3), minval=-0.9, maxval=0.9)

        def loss(p):
            return jnp.sum(ngp.query_density(p, x, aabb, cfg))

        g = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in flat)


class TestRunLengthSegmentSum:
    def test_matches_direct_scatter(self):
        import numpy as np

        from dregnerf_tpu.ops.rle import (rle_scatter_add,
                                          run_length_segment_sum)

        rng = np.random.default_rng(0)
        # ray-coherent slots: runs of random length 1..9
        runs = rng.integers(1, 10, size=200)
        slots = rng.integers(0, 64, size=200)
        idx = np.repeat(slots, runs).astype(np.int32)[:1024]
        vals = rng.normal(size=(len(idx), 8)).astype(np.float32)

        ridx, rsum, n_runs = run_length_segment_sum(
            jnp.asarray(idx), jnp.asarray(vals), max_runs=512)
        # true run count
        expect_runs = 1 + int((idx[1:] != idx[:-1]).sum())
        assert int(n_runs) == expect_runs
        # per-run sums reassemble the direct scatter
        direct = np.zeros((64, 8), np.float32)
        np.add.at(direct, idx, vals)
        via_rle = np.asarray(
            rle_scatter_add(jnp.zeros((64, 8)), jnp.asarray(idx),
                            jnp.asarray(vals), max_runs=512))
        np.testing.assert_allclose(via_rle, direct, rtol=1e-5, atol=1e-5)
        # unused run slots are zero rows
        assert np.all(np.asarray(rsum)[expect_runs:] == 0)

    def test_single_run_and_alternating(self):
        import numpy as np

        from dregnerf_tpu.ops.rle import run_length_segment_sum

        one = jnp.zeros(16, jnp.int32)
        v = jnp.ones((16, 4))
        ridx, rsum, n = run_length_segment_sum(one, v, max_runs=4)
        assert int(n) == 1
        np.testing.assert_allclose(np.asarray(rsum)[0], 16.0)

        alt = jnp.asarray(np.tile([3, 7], 8).astype(np.int32))
        ridx, rsum, n = run_length_segment_sum(alt, v, max_runs=16)
        assert int(n) == 16  # no compression possible
        np.testing.assert_allclose(np.asarray(rsum)[:16], 1.0)
        np.testing.assert_allclose(
            np.asarray(ridx)[:16], np.tile([3, 7], 8))

    def test_overflow_drops_not_corrupts(self):
        import numpy as np

        from dregnerf_tpu.ops.rle import run_length_segment_sum

        idx = jnp.asarray(np.arange(32, dtype=np.int32))  # 32 runs
        v = jnp.ones((32, 2))
        ridx, rsum, n = run_length_segment_sum(idx, v, max_runs=8)
        assert int(n) == 32  # reported truthfully
        # kept runs are correct; none is double-counted
        np.testing.assert_allclose(np.asarray(rsum[:8]), 1.0)
        np.testing.assert_allclose(np.asarray(ridx[:8]), np.arange(8))

"""Region-packed occupancy tests: the packed bitmask path must agree with
direct binary lookup everywhere the marcher uses it."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dregnerf_tpu.ops import occupancy


class TestPackRegions:
    def test_bits_match_binary(self, rng):
        r = 16
        binary = jnp.asarray(rng.uniform(size=(r,) * 3) < 0.4)
        regions = occupancy.pack_regions(binary)
        assert regions.shape == (4, 4, 4, 16)
        b = np.asarray(binary)
        reg = np.asarray(regions)
        # check every (supercell, offset) bit
        for scx in range(4):
            for ox in range(8):
                cx = scx * 4 - 2 + ox
                if not 0 <= cx < r:
                    continue
                for scy, oy, scz, oz in [(0, 2, 0, 2), (1, 3, 2, 5), (3, 7, 3, 0)]:
                    cy = scy * 4 - 2 + oy
                    cz = scz * 4 - 2 + oz
                    if not (0 <= cy < r and 0 <= cz < r):
                        continue
                    bit = ox * 64 + oy * 8 + oz
                    word, pos = bit >> 5, bit & 31
                    got = (reg[scx, scy, scz, word] >> pos) & 1
                    assert got == int(b[cx, cy, cz]), (scx, ox, cy, cz)

    def test_query_regions_matches_query_binary(self, rng):
        r = 32
        binary = jnp.asarray(rng.uniform(size=(r,) * 3) < 0.3)
        grid = occupancy.init_grid(r)._replace(binary=binary)
        regions = occupancy.pack_regions(binary)
        # cells queried with themselves as leader (group size 1)
        cells = jnp.asarray(rng.integers(0, r, size=(500, 3)), jnp.int32)
        got = occupancy.query_regions(regions, r, cells[:, None, :], cells)[:, 0]
        expected = binary[cells[:, 0], cells[:, 1], cells[:, 2]]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))

    def test_leader_offset_within_margin(self, rng):
        """Cells up to +-1 cell from the leader must still resolve exactly."""
        r = 32
        binary = jnp.asarray(rng.uniform(size=(r,) * 3) < 0.3)
        regions = occupancy.pack_regions(binary)
        leaders = jnp.asarray(rng.integers(2, r - 2, size=(300, 3)), jnp.int32)
        offs = jnp.asarray(rng.integers(-1, 2, size=(300, 3)), jnp.int32)
        cells = leaders + offs
        got = occupancy.query_regions(regions, r, cells[:, None, :], leaders)[:, 0]
        expected = binary[cells[:, 0], cells[:, 1], cells[:, 2]]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))

    def test_out_of_region_is_conservative(self):
        r = 16
        binary = jnp.zeros((r,) * 3, bool)  # nothing occupied
        regions = occupancy.pack_regions(binary)
        leader = jnp.array([[2, 2, 2]], jnp.int32)
        far_cell = jnp.array([[14, 14, 14]], jnp.int32)  # outside the region
        got = occupancy.query_regions(regions, r, far_cell[:, None, :], leader)[:, 0]
        assert bool(got[0])  # conservative: reads occupied


class TestMarcherWithRegions:
    def test_march_matches_dense_reference(self, rng):
        """march_rays with the region path must produce the same sample set
        as a brute-force per-step binary lookup."""
        from dregnerf_tpu.geometry.cameras import ray_aabb_intersect
        from dregnerf_tpu.ops.contraction import contract
        from dregnerf_tpu.ops.ray_march import march_rays

        r = 32
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        binary = jnp.asarray(rng.uniform(size=(r,) * 3) < 0.3)
        grid = occupancy.init_grid(r)._replace(binary=binary)
        n = 16
        o = jnp.asarray(
            np.stack([rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
                      np.full(n, -3.0)], -1), jnp.float32)
        d_raw = np.stack([rng.normal(0, 0.2, n), rng.normal(0, 0.2, n),
                          np.ones(n)], -1)
        d = jnp.asarray(d_raw / np.linalg.norm(d_raw, axis=-1, keepdims=True),
                        jnp.float32)
        # the convention step (diag / max_steps): group sizing in
        # _candidate_mask assumes it — coarser steps only add conservative
        # extras (see its docstring), but the exactness assertion below
        # holds under the convention
        S = 512
        step = float(2.0 * 3**0.5 / S)
        packed = march_rays(o, d, grid, aabb, "aabb", step, 1 << 14, S)

        # dense reference
        t_lo, t_hi = ray_aabb_intersect(o, d, aabb)
        ts = t_lo[:, None] + jnp.arange(S)[None] * step + step / 2
        pos = o[:, None] + d[:, None] * ts[..., None]
        u = contract(pos, aabb, "aabb")
        idx = jnp.floor(u * r).astype(jnp.int32)
        ok = jnp.all((idx >= 0) & (idx < r), -1)
        ci = jnp.clip(idx, 0, r - 1)
        occ = binary[ci[..., 0], ci[..., 1], ci[..., 2]] & ok
        ref_mask = occ & (ts < t_hi[:, None])

        got = set()
        for rid, t0, v in zip(np.asarray(packed.ray_id), np.asarray(packed.t_start),
                              np.asarray(packed.valid)):
            if v:
                got.add((int(rid), round(float(t0), 5)))
        expected = set()
        tm = np.asarray(ts) - step / 2
        for ray in range(n):
            for s_i in np.where(np.asarray(ref_mask)[ray])[0]:
                expected.add((ray, round(float(tm[ray, s_i]), 5)))
        # region path may add conservative extras but must not LOSE samples
        missing = expected - got
        assert not missing, f"lost {len(missing)} samples"
        extra = got - expected
        assert len(extra) <= len(expected) * 0.15 + 5

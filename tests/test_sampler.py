"""Sampler tests: Sobol sequence correctness, Owen scrambling, stratification
balance (the test the reference left as dead code, src/math/sampler.zig:350-396),
and hash-RNG statistics."""

import jax.numpy as jnp
import numpy as np
import pytest

from zig_weekend_raytracer_tpu.sampling import hashrng, sobol
from zig_weekend_raytracer_tpu.sampling.sampler import SamplerKind, pixel_offsets


class TestSobol:
    def test_dim0_is_van_der_corput(self):
        """Dimension 0's generator matrix is the identity in bit-reversed
        space: sample(a) = bitreverse(a) / 2^32."""
        idx = jnp.arange(64, dtype=jnp.uint32)
        hi = jnp.zeros_like(idx)
        got = np.asarray(sobol.sobol_sample_u32(hi, idx, 0))
        expect = np.asarray(sobol.bit_reverse32(idx))
        np.testing.assert_array_equal(got, expect)

    def test_first_samples_dim0(self):
        idx = jnp.arange(8, dtype=jnp.uint32)
        hi = jnp.zeros_like(idx)
        s = np.asarray(sobol.sobol_sample(hi, idx, 0))
        np.testing.assert_allclose(
            s, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-6
        )

    def test_dim1_low_discrepancy_pairs(self):
        """(dim0, dim1) of the first 2^k points form a (0,2)-net: each of the
        2^k elementary intervals contains exactly one point."""
        k = 4
        n = 1 << k
        idx = jnp.arange(n, dtype=jnp.uint32)
        hi = jnp.zeros_like(idx)
        x = np.asarray(sobol.sobol_sample(hi, idx, 0))
        y = np.asarray(sobol.sobol_sample(hi, idx, 1))
        # stratify: n cells along x must each contain exactly one point
        cells_x = np.floor(x * n).astype(int)
        assert sorted(cells_x.tolist()) == list(range(n))
        cells_y = np.floor(y * n).astype(int)
        assert sorted(cells_y.tolist()) == list(range(n))

    def test_bit_reverse(self):
        v = jnp.asarray([0, 1, 0x80000000, 0xFFFFFFFF, 0x12345678], jnp.uint32)
        r = np.asarray(sobol.bit_reverse32(v))
        assert r[0] == 0
        assert r[1] == 0x80000000
        assert r[2] == 1
        assert r[3] == 0xFFFFFFFF
        assert r[4] == int(f"{0x12345678:032b}"[::-1], 2)

    def test_owen_scramble_preserves_uniformity(self):
        n = 4096
        idx = jnp.arange(n, dtype=jnp.uint32)
        hi = jnp.zeros_like(idx)
        v = sobol.sobol_sample_u32(hi, idx, 3)
        s = np.asarray(sobol.owen_fast_scramble(v, jnp.uint32(0xDEADBEEF)))
        u = s.astype(np.float64) / 2**32
        assert abs(u.mean() - 0.5) < 0.02
        # deterministic
        s2 = np.asarray(sobol.owen_fast_scramble(v, jnp.uint32(0xDEADBEEF)))
        np.testing.assert_array_equal(s, s2)
        # different seed -> different permutation
        s3 = np.asarray(sobol.owen_fast_scramble(v, jnp.uint32(1)))
        assert (s != s3).any()

    def test_interval_to_index_distributes_pixels(self):
        """Every pixel's sample 0 must land inside that pixel after the
        global-index remap (sobolIntervalToIndex's defining property)."""
        scale = 8
        log2 = 3
        px, py = jnp.meshgrid(
            jnp.arange(scale, dtype=jnp.uint32),
            jnp.arange(scale, dtype=jnp.uint32),
            indexing="ij",
        )
        px = px.reshape(-1)
        py = py.reshape(-1)
        sample_idx = jnp.zeros_like(px)
        hi, lo = sobol.sobol_interval_to_index(log2, sample_idx, px, py)
        sx = np.asarray(sobol.sobol_sample(hi, lo, 0)) * scale
        sy = np.asarray(sobol.sobol_sample(hi, lo, 1)) * scale
        np.testing.assert_array_equal(np.floor(sx).astype(int), np.asarray(px))
        np.testing.assert_array_equal(np.floor(sy).astype(int), np.asarray(py))

    def test_interval_to_index_distinct_per_sample(self):
        hi0, lo0 = sobol.sobol_interval_to_index(
            3, jnp.uint32(0)[None], jnp.uint32(2)[None], jnp.uint32(5)[None]
        )
        hi1, lo1 = sobol.sobol_interval_to_index(
            3, jnp.uint32(1)[None], jnp.uint32(2)[None], jnp.uint32(5)[None]
        )
        assert (int(hi0[0]), int(lo0[0])) != (int(hi1[0]), int(lo1[0]))


class TestPixelOffsets:
    def _grid(self, n):
        px = jnp.zeros((n,), jnp.int32)
        py = jnp.zeros((n,), jnp.int32)
        sidx = jnp.arange(n, dtype=jnp.int32)
        ray_id = jnp.arange(n, dtype=jnp.uint32)
        return px, py, sidx, ray_id

    def test_independent_range(self):
        px, py, sidx, rid = self._grid(1024)
        ox, oy = pixel_offsets(
            SamplerKind.INDEPENDENT, jnp.uint32(0), rid, px, py, sidx,
            1024, 8, 8,
        )
        ox, oy = np.asarray(ox), np.asarray(oy)
        assert ox.min() >= -0.5 and ox.max() < 0.5
        assert abs(ox.mean()) < 0.03

    def test_stratified_balance(self):
        """sqrt(spp)^2 strata each get exactly one sample (the reference's
        unfinished stratification checker, src/math/sampler.zig:371-396)."""
        spp = 64
        px, py, sidx, rid = self._grid(spp)
        ox, oy = pixel_offsets(
            SamplerKind.STRATIFIED, jnp.uint32(3), rid, px, py, sidx,
            spp, 8, 8,
        )
        sq = 8
        cx = np.floor((np.asarray(ox) + 0.5) * sq).astype(int)
        cy = np.floor((np.asarray(oy) + 0.5) * sq).astype(int)
        cells = set(zip((np.asarray(sidx) // sq).tolist(), (np.asarray(sidx) % sq).tolist()))
        assert len(cells) == spp
        # each sample lands in its own stratum
        np.testing.assert_array_equal(cx, np.asarray(sidx) // sq)
        np.testing.assert_array_equal(cy, np.asarray(sidx) % sq)

    def test_sobol_in_unit_square(self):
        n = 256
        px = jnp.full((n,), 3, jnp.int32)
        py = jnp.full((n,), 5, jnp.int32)
        sidx = jnp.arange(n, dtype=jnp.int32)
        rid = jnp.arange(n, dtype=jnp.uint32)
        ox, oy = pixel_offsets(
            SamplerKind.SOBOL, jnp.uint32(0), rid, px, py, sidx, n, 8, 8
        )
        ox, oy = np.asarray(ox), np.asarray(oy)
        assert ox.min() >= 0.0 and ox.max() < 1.0
        assert oy.min() >= 0.0 and oy.max() < 1.0
        # QMC: offsets within the pixel are well spread
        assert abs(ox.mean() - 0.5) < 0.05


class TestHashRng:
    def test_uniform_statistics(self):
        rid = jnp.arange(1 << 16, dtype=jnp.uint32)
        u1, u2, u3, u4 = hashrng.uniform4(jnp.uint32(7), rid, 5)
        for u in (u1, u2, u3, u4):
            u = np.asarray(u)
            assert 0.0 <= u.min() and u.max() < 1.0
            assert abs(u.mean() - 0.5) < 0.01
            assert abs(u.var() - 1 / 12) < 0.005

    def test_streams_decorrelated(self):
        rid = jnp.arange(1 << 14, dtype=jnp.uint32)
        a = np.asarray(hashrng.uniform1(jnp.uint32(7), rid, 1))
        b = np.asarray(hashrng.uniform1(jnp.uint32(7), rid, 2))
        c = np.asarray(hashrng.uniform1(jnp.uint32(8), rid, 1))
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.03
        assert abs(np.corrcoef(a, c)[0, 1]) < 0.03

    def test_gauss3_moments(self):
        rid = jnp.arange(1 << 16, dtype=jnp.uint32)
        g = hashrng.gauss3(jnp.uint32(1), rid, 9)
        for comp in (g.x, g.y, g.z):
            comp = np.asarray(comp)
            assert abs(comp.mean()) < 0.02
            assert abs(comp.std() - 1.0) < 0.02

    def test_unit_sphere_uniform(self):
        rid = jnp.arange(1 << 15, dtype=jnp.uint32)
        d = hashrng.unit_sphere(hashrng.gauss3(jnp.uint32(2), rid, 0))
        norms = np.asarray(d.x) ** 2 + np.asarray(d.y) ** 2 + np.asarray(d.z) ** 2
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        assert abs(np.asarray(d.z).mean()) < 0.02

    def test_cosine_direction_distribution(self):
        rid = jnp.arange(1 << 15, dtype=jnp.uint32)
        u1, u2, _, _ = hashrng.uniform4(jnp.uint32(3), rid, 0)
        d = hashrng.cosine_direction_z(u1, u2)
        z = np.asarray(d.z)
        assert (z >= 0).all()
        # E[cos(theta)] under cosine weighting = 2/3
        assert abs(z.mean() - 2 / 3) < 0.01


class TestSampleDimension:
    """get1D/get2D parity path: scrambled Sobol for dimensions >= 2
    (reference: src/math/sampler.zig:203-247)."""

    def test_scrambled_uniform_and_deterministic(self):
        from zig_weekend_raytracer_tpu.sampling.sampler import sample_dimension

        idx = jnp.arange(1024, dtype=jnp.uint32)
        hi = jnp.zeros_like(idx)
        a = np.asarray(sample_dimension(hi, idx, 5, jnp.uint32(42)))
        b = np.asarray(sample_dimension(hi, idx, 5, jnp.uint32(42)))
        np.testing.assert_array_equal(a, b)
        assert 0.0 <= a.min() and a.max() < 1.0
        assert abs(a.mean() - 0.5) < 0.03
        # different dimension or seed gives a different sequence
        c = np.asarray(sample_dimension(hi, idx, 6, jnp.uint32(42)))
        d = np.asarray(sample_dimension(hi, idx, 5, jnp.uint32(43)))
        assert (a != c).any() and (a != d).any()

    def test_unscrambled_matches_raw_sobol(self):
        from zig_weekend_raytracer_tpu.sampling.sampler import sample_dimension

        idx = jnp.arange(64, dtype=jnp.uint32)
        hi = jnp.zeros_like(idx)
        a = np.asarray(sample_dimension(hi, idx, 0, 0, scramble=False))
        b = np.asarray(sobol.sobol_sample(hi, idx, 0))
        np.testing.assert_array_equal(a, b)

    def test_dimension_wraps_at_1024(self):
        from zig_weekend_raytracer_tpu.sampling.sampler import sample_dimension

        idx = jnp.arange(16, dtype=jnp.uint32)
        hi = jnp.zeros_like(idx)
        a = np.asarray(sample_dimension(hi, idx, 1024 + 3, 0, scramble=False))
        b = np.asarray(sample_dimension(hi, idx, 3, 0, scramble=False))
        np.testing.assert_array_equal(a, b)

"""Golden and property tests for the deterministic primitive library.

The reference has no tests (SURVEY.md §4); strategy here follows SURVEY.md §4's
blueprint: golden-value unit tests for each noise/hash primitive against the reference
formulas, evaluated with exact integer semantics (hash/LCG goldens computed by hand
below with Python integer arithmetic) plus property tests for the float noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mega_minecraft_tpu.ops import hashes, noise


def _hash_py(a: int) -> int:
    M = 0xFFFFFFFF
    a = ((a + 0x7ED55D16) + (a << 12)) & M
    a = ((a ^ 0xC761C23C) ^ (a >> 19)) & M
    a = ((a + 0x165667B1) + (a << 5)) & M
    a = ((a + 0xD3A2646C) ^ (a << 9)) & M
    a = ((a + 0xFD7046C5) + (a << 3)) & M
    a = ((a ^ 0xB55A4F09) ^ (a >> 16)) & M
    return a


class TestHash:
    def test_matches_integer_model(self):
        xs = np.array([0, 1, 2, 12345, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF], dtype=np.uint32)
        got = np.asarray(hashes.hash_u32(jnp.asarray(xs)))
        want = np.array([_hash_py(int(x)) for x in xs], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_seed3_matches_integer_model(self):
        # h = hash((1<<31) | (x<<22) | y) ^ hash(z), uint32 wrap, then mod 2^31-1 (0->1)
        for x, y, z in [(0, 0, 0), (5, -3, 329828101), (-40, 40, 7)]:
            xm = x & 0xFFFFFFFF
            ym = y & 0xFFFFFFFF
            zm = z & 0xFFFFFFFF
            h = _hash_py(((1 << 31) | ((xm << 22) & 0xFFFFFFFF) | ym) & 0xFFFFFFFF) ^ _hash_py(zm)
            s = h % 2147483647
            if s == 0:
                s = 1
            got = int(np.asarray(hashes.seed_3(x, y, z)))
            assert got == s

    def test_lcg_sequence_matches_minstd(self):
        state = 12345
        got_states = []
        s = jnp.uint32(state)
        for _ in range(5):
            s = hashes.lcg_next(s)
            got_states.append(int(np.asarray(s)))
        want = []
        s2 = state
        for _ in range(5):
            s2 = (48271 * s2) % 2147483647
            want.append(s2)
        assert got_states == want

    def test_u01_range(self):
        vals = []
        s = hashes.seed_3(3, 4, 5)
        for _ in range(100):
            v, s = hashes.lcg_u01(s)
            vals.append(float(np.asarray(v)))
        vals = np.array(vals)
        assert (vals >= 0).all() and (vals <= 1).all()
        assert vals.std() > 0.2  # roughly uniform


class TestSinHash:
    def test_rand1_from2_matches_f32_model(self):
        # independently model fract(sin(dot(v,(238.68,491.28)))*39021.426) in f32,
        # pinning whichever sin mode is ENABLED (conftest turns on the correctly-
        # rounded sin on TPU; plain XLA sin elsewhere)
        v = np.array([[1.5, -2.25], [100.0, 7.0], [0.0, 0.0]], dtype=np.float32)
        d = (v[:, 0] * np.float32(238.68) + v[:, 1] * np.float32(491.28)).astype(np.float32)
        if hashes.EXACT_SIN:
            # correctly-rounded f32 sin == f64 sin rounded to f32 (the 39021x
            # amplification then stays below 1 f32 ulp of the product)
            s = np.sin(d.astype(np.float64)).astype(np.float32)
            tol = 3e-5
        else:
            s = np.sin(d)
            # XLA's sin and numpy's may differ by a few f32 ulps; the x39021
            # amplification turns EACH ulp into ~4.6e-3 of hash movement, so
            # this branch can only pin the formula structure (dot coefficients
            # + scale — a wrong constant shifts results by ~0.25 on average),
            # not the sin rounding.  The CR branch above is the tight gate.
            tol = 0.02
        want = s * np.float32(39021.426)
        want = want - np.floor(want)
        got = np.asarray(hashes.rand1_from2(jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1])))
        d_wrap = np.abs(got - want)
        d_wrap = np.minimum(d_wrap, 1 - d_wrap)  # fract wrap distance
        assert d_wrap.max() < tol, (got, want)

    def test_deterministic(self):
        a = np.asarray(hashes.rand3_from3(1.0, 2.0, 3.0))
        b = np.asarray(hashes.rand3_from3(1.0, 2.0, 3.0))
        np.testing.assert_array_equal(a, b)

    def test_sin_cr_placement_seed_range(self):
        # isFeaturePos (chunk.cu:999-1008) hashes grid corners with seeds up to
        # feature*518721 (chunk.cu:1134), so sin-dot args reach |d| ~ 6.6e9 —
        # far past 2^23*pi.  The round-3 _sin_cr collapsed the quadrant integer
        # there (wrong-quadrant sin -> every placement displaced, the r3
        # block-grid golden regression).  Pin: correctly-rounded vs f64 at a
        # <=1e-4 mismatch rate across the real placement-seed argument range.
        rng = np.random.RandomState(7)
        feats = np.arange(1, 31)
        seeds = np.concatenate(
            [feats * 518721, (feats[:, None] * 98239 + np.arange(32)[None, :] * 191702).ravel()]
        ).astype(np.float32)
        g = rng.randint(-20000, 20000, (200, 2)).astype(np.float32)
        d = (
            (g[:, 0:1] * np.float32(238.68) + g[:, 1:2] * np.float32(491.28))
            + seeds[None, :] * np.float32(640.88)
        ).astype(np.float32).ravel()
        ours = np.asarray(hashes._sin_cr(jnp.asarray(d)))
        ref = np.sin(d.astype(np.float64)).astype(np.float32)
        rate = (ours != ref).mean()
        assert rate < 1e-4, f"CR sin mismatch rate {rate} over placement-seed args"
        # and the matches must dominate even in the top magnitude decade
        big = np.abs(d) > 1e9
        assert big.any()
        assert (ours[big] != ref[big]).mean() < 1e-4

    def test_div_sqrt_cr(self):
        # The TPU VPU's divide/sqrt are Newton approximations, correctly
        # rounded on only ~65%/~57% of inputs (measured on v5e) — the worley
        # distances and cave ratios then drift 1 ulp from the golden
        # generator's IEEE ops.  div_cr/sqrt_cr add one exact-residual
        # correction; pin bit-equality vs IEEE (numpy) in exact mode.
        if not hashes.EXACT_SIN:
            pytest.skip("plain mode: native divide/sqrt by design")
        rng = np.random.RandomState(11)
        a = np.concatenate(
            [rng.uniform(1e-3, 4.0, 100000), rng.uniform(1.0, 1e6, 50000)]
        ).astype(np.float32)
        b = np.concatenate(
            [rng.uniform(1e-3, 4.0, 100000), rng.uniform(1.0, 1e6, 50000)]
        ).astype(np.float32)
        q = np.asarray(jax.jit(hashes.div_cr)(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(q.view(np.uint32), (a / b).view(np.uint32))
        s = np.asarray(jax.jit(hashes.sqrt_cr)(jnp.asarray(a)))
        np.testing.assert_array_equal(s.view(np.uint32), np.sqrt(a).view(np.uint32))

    def test_strict_sum_matches_ieee(self):
        # XLA's simplifier factors x*C + y*C + z*C into (x+y+z)*C (one
        # rounding); strict_sum pins the reference's per-term IEEE roundings
        # (simplex3's skew sums, ops/noise.py).
        if not hashes.EXACT_SIN:
            pytest.skip("plain mode keeps the factored form")
        rng = np.random.RandomState(12)
        x = rng.uniform(-200, 200, 100000).astype(np.float32)
        y = rng.uniform(-200, 200, 100000).astype(np.float32)
        z = rng.uniform(-200, 200, 100000).astype(np.float32)
        C = np.float32(1.0 / 3.0)

        @jax.jit
        def f(x, y, z):
            return hashes.strict_sum(x * jnp.float32(C), y * jnp.float32(C), z * jnp.float32(C))

        got = np.asarray(f(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)))
        want = (x * C + y * C) + z * C
        np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


class TestSimplex:
    def test_range_and_zero_mean(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-100, 100, 4096).astype(np.float32))
        y = jnp.asarray(rng.uniform(-100, 100, 4096).astype(np.float32))
        v = np.asarray(noise.simplex2(x, y))
        assert np.abs(v).max() <= 1.0 + 1e-3
        assert abs(v.mean()) < 0.05
        assert v.std() > 0.1

    def test_simplex3_range(self):
        rng = np.random.RandomState(1)
        p = rng.uniform(-50, 50, (3, 4096)).astype(np.float32)
        v = np.asarray(noise.simplex3(*[jnp.asarray(c) for c in p]))
        assert np.abs(v).max() <= 1.0 + 1e-3
        assert abs(v.mean()) < 0.05

    def test_continuity(self):
        # noise should be smooth: small input deltas -> small output deltas
        x = jnp.asarray(np.linspace(0, 10, 10001, dtype=np.float32))
        y = jnp.zeros_like(x) + 0.5
        v = np.asarray(noise.simplex2(x, y))
        assert np.abs(np.diff(v)).max() < 0.01

    def test_known_zero_at_integer_simplex_corner(self):
        # at (0,0) the simplex contribution cancels to a fixed value; just pin it
        v0 = float(np.asarray(noise.simplex2(jnp.float32(0.0), jnp.float32(0.0))))
        v1 = float(np.asarray(noise.simplex2(jnp.float32(0.0), jnp.float32(0.0))))
        assert v0 == v1


class TestFbmWorley:
    def test_fbm_amplitude_bound(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.uniform(-100, 100, 1024).astype(np.float32))
        y = jnp.asarray(rng.uniform(-100, 100, 1024).astype(np.float32))
        v = np.asarray(noise.fbm2(x, y, octaves=5))
        # sum of amplitudes = 0.5+0.25+...+0.03125 < 1
        assert np.abs(v).max() < 1.0

    def test_worley_f1_bounds(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.uniform(-100, 100, 1024).astype(np.float32))
        y = jnp.asarray(rng.uniform(-100, 100, 1024).astype(np.float32))
        out = noise.worley2(x, y, want_color=True, want_edge=True)
        f1 = np.asarray(out["f1"])
        edge = np.asarray(out["edge"])
        assert (f1 >= 0).all() and (f1 <= np.sqrt(8.0)).all()
        assert (edge >= -1e-6).all()
        for c in out["color"]:
            c = np.asarray(c)
            assert (c >= 0).all() and (c <= 1).all()

    def test_special_cave_noise_nonnegative(self):
        rng = np.random.RandomState(4)
        p = rng.uniform(-20, 20, (3, 1024)).astype(np.float32)
        v = np.asarray(noise.special_cave_noise(*[jnp.asarray(c) for c in p]))
        # min3 >= min1 so ratio - 1 >= 0
        assert (v >= -1e-5).all()

    def test_worley3_matches_bruteforce_single_point(self):
        # brute-force f1 at one point using the same feature-point hash
        px, py, pz = 3.7, -1.2, 0.4
        ix, iy, iz = np.floor([px, py, pz])
        best = 1e30
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                for oz in (-1, 0, 1):
                    r = hashes.rand3_from3(
                        jnp.float32(ix + ox), jnp.float32(iy + oy), jnp.float32(iz + oz)
                    )
                    rx, ry, rz = [float(np.asarray(c)) for c in r]
                    dx = ox + rx - (px - ix)
                    dy = oy + ry - (py - iy)
                    dz = oz + rz - (pz - iz)
                    best = min(best, np.sqrt(dx * dx + dy * dy + dz * dz))
        got = float(np.asarray(noise.worley3(jnp.float32(px), jnp.float32(py), jnp.float32(pz))["f1"]))
        assert got == pytest.approx(best, rel=1e-5)


class TestSmoothstep:
    def test_matches_glm(self):
        x = jnp.asarray(np.linspace(-1, 2, 301, dtype=np.float32))
        v = np.asarray(noise.smoothstep(0.0, 1.0, x))
        t = np.clip(np.linspace(-1, 2, 301), 0, 1)
        np.testing.assert_allclose(v, t * t * (3 - 2 * t), rtol=1e-6, atol=1e-6)

    def test_descending_edges(self):
        # reference uses smoothstep(142, 95, y): 1 below 95, 0 above 142
        lo = float(np.asarray(noise.smoothstep(142.0, 95.0, jnp.float32(90.0))))
        hi = float(np.asarray(noise.smoothstep(142.0, 95.0, jnp.float32(150.0))))
        assert lo == pytest.approx(1.0)
        assert hi == pytest.approx(0.0)

"""Renderer tests: DDA vs brute force, sky invariants, meshing, denoise, tonemap
(SURVEY.md §4 strategy (c): tiny synthetic scenes, known camera)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mega_minecraft_tpu.render import brickmap, camera, denoise, meshing, sky, tonemap, tracer
from mega_minecraft_tpu.world.blocks import SOLID, Block


@pytest.fixture(scope="module")
def box_scene():
    rng = np.random.RandomState(0)
    vol = np.zeros((32, 32, 384), np.uint8)
    vol[:, :, :96] = int(Block.STONE)
    for _ in range(20):
        z, x, y = rng.randint(0, 28), rng.randint(0, 28), rng.randint(96, 200)
        vol[z : z + 3, x : x + 3, y : y + 4] = int(Block.STONE)
    chunks = vol.reshape(2, 16, 2, 16, 384).transpose(0, 2, 1, 3, 4)
    return vol, brickmap.build_scene(jnp.asarray(chunks), 0, 0)


class TestTrace:
    def test_matches_bruteforce(self, box_scene):
        vol, scene = box_scene
        rng = np.random.RandomState(1)
        N = 128
        o = np.stack(
            [rng.uniform(2, 30, N), rng.uniform(100, 250, N), rng.uniform(2, 30, N)], -1
        ).astype(np.float32)
        d = rng.normal(size=(N, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        res = tracer.trace(
            scene,
            jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]),
            jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
            jnp.full((N,), jnp.uint8(0)),
        )
        hit = np.asarray(res.hit)
        t = np.asarray(res.t)

        def brute(o1, d1):
            tt = 1e-4
            while tt < 600:
                p = o1 + d1 * tt
                v = np.floor(p).astype(int)
                if 0 <= v[0] < 32 and 0 <= v[1] < 384 and 0 <= v[2] < 32:
                    if SOLID[vol[v[2], v[0], v[1]]]:
                        return True, tt
                elif tt > 1.0:
                    out = p[1] > 384 or p[1] < 0 or max(p[0], p[2]) > 33 or min(p[0], p[2]) < -1
                    if out:
                        return False, 0
                tt += 0.02
            return False, 0

        bad = 0
        for i in range(N):
            bh, bt = brute(o[i], d[i])
            if bh != hit[i] or (bh and abs(bt - t[i]) > 0.1):
                bad += 1
        assert bad == 0

    @pytest.mark.slow
    def test_macro_on_off_bit_identical(self, box_scene):
        """The two-level DDA's contract (tracer.py trace docstring): skips and
        level changes only ever move rays through PROVEN-empty space, so the
        traversal outcome (hit mask, hit block, hit t) is bit-identical with
        the macro level disabled — while the macro level must strictly reduce
        step counts for at least some high-altitude rays (else it is dead
        weight; VERDICT r3 weak #4)."""
        vol, scene = box_scene
        rng = np.random.RandomState(3)
        N = 128
        # high-altitude origins so clearances saturate the 63 cap and lanes
        # actually ascend; mixed steep/grazing directions, up and down
        o = np.stack(
            [rng.uniform(2, 30, N), rng.uniform(250, 380, N), rng.uniform(2, 30, N)], -1
        ).astype(np.float32)
        d = rng.normal(size=(N, 3)).astype(np.float32)
        d[: N // 2, 1] = -np.abs(d[: N // 2, 1])  # half descend toward terrain
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        args = (
            jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]),
            jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
            jnp.full((N,), jnp.uint8(0)),
        )
        on, s_on = tracer.trace(scene, *args, want_steps=True, use_macro=True)
        off, s_off = tracer.trace(scene, *args, want_steps=True, use_macro=False)
        np.testing.assert_array_equal(np.asarray(on.hit), np.asarray(off.hit))
        np.testing.assert_array_equal(np.asarray(on.block), np.asarray(off.block))
        hit = np.asarray(on.hit)
        np.testing.assert_array_equal(
            np.asarray(on.t)[hit], np.asarray(off.t)[hit]
        )
        assert (np.asarray(s_on) < np.asarray(s_off)).any(), (
            "macro level never engaged/never saved a step"
        )

    @pytest.mark.slow
    def test_aerial_descent_exact(self, box_scene):
        """Steep descents ride the skyline-descent field (brickmap bits 26-30);
        landings must still be exact: straight-down rays from far above terrain
        hit the top solid of their column at the analytic t."""
        vol, scene = box_scene
        ys = np.arange(384)
        for (x, z) in [(2, 2), (10, 17), (25, 5), (30, 30)]:
            top = int(np.max(np.where(SOLID[vol[z, x]], ys, -1)))
            res = tracer.trace(
                scene,
                jnp.asarray([x + 0.5]), jnp.asarray([380.0]), jnp.asarray([z + 0.5]),
                jnp.asarray([0.0]), jnp.asarray([-1.0]), jnp.asarray([0.0]),
                jnp.full((1,), jnp.uint8(0)),
            )
            assert bool(res.hit[0])
            assert abs(float(res.t[0]) - (380.0 - (top + 1))) < 1e-2
            assert float(res.ny[0]) == 1.0

    def test_skyline_descent_field_values(self):
        """The stored quantized descent q must satisfy q == clip(y − skyline, 0,
        124)//4 with skyline = max solid top within horizontal L∞ SKY_R."""
        from mega_minecraft_tpu.render.brickmap import SKY_R, _skyline_descent

        rng = np.random.RandomState(3)
        vol = rng.rand(24, 24, 64) < 0.02
        q = np.asarray(_skyline_descent(jnp.asarray(vol)))
        top = np.max(np.where(vol, np.arange(64)[None, None, :], -1), axis=2)
        for _ in range(300):
            z, x, y = rng.randint(24), rng.randint(24), rng.randint(64)
            zlo, zhi = max(0, z - SKY_R), min(24, z + SKY_R + 1)
            xlo, xhi = max(0, x - SKY_R), min(24, x + SKY_R + 1)
            sky = int(top[zlo:zhi, xlo:xhi].max())
            assert q[z, x, y] == min(max(y - sky, 0), 124) // 4

    @pytest.mark.slow
    def test_tiling_remainder_matches_untiled(self, box_scene):
        """A height that does not divide tile_rows renders its last rows via an
        overlapping full-shaped band; rays are keyed by global pixel, so the
        result must match the untiled render EXCEPT for isolated rays grazing a
        voxel boundary: programs of different shapes may contract fma/reassociate
        differently, and a one-ulp difference there flips a discrete traversal
        decision (measured on XLA:CPU: 3 of 2432 pixels, scattered — NOT
        remainder-row concentrated; a genuine remainder-band bug corrupts whole
        64-px rows).  So the contract is: ≤0.5% of pixels may diverge beyond
        tolerance, per AOV."""
        _, scene = box_scene
        player = camera.Player(pos=np.array([16.0, 150.0, -10.0], np.float32), phi=-0.4)
        H, W = 38, 64  # 38 % 4 == 2 -> remainder path
        cam = player.camera_params(W, H)
        params = sky.sky_params(1.0, 0.0)
        tiled = tracer.render_sample(scene, cam, params, H, W, jnp.int32(3),
                                     tile_rows=4, tile_cols=None)
        untiled = tracer.render_sample(scene, cam, params, H, W, jnp.int32(3),
                                       tile_rows=None, tile_cols=None)
        for t, u in zip(tiled, untiled):
            t, u = np.asarray(t), np.asarray(u)
            assert t.shape == (H, W, 3)
            bad = np.abs(t - u).max(axis=-1) > 1e-3
            assert bad.sum() <= H * W * 0.005, (
                f"{bad.sum()} divergent pixels at {np.argwhere(bad)[:20]}"
            )

    @pytest.mark.slow
    def test_compact_matches_tiled(self, box_scene):
        """render_sample_compact (partition-by-aliveness + segmented bounce loop)
        computes the SAME paths as the spatial-band renderer — every ray consumes
        the identical per-global-pixel seed stream — so the two agree per AOV to
        the cross-program-shape contract of the tiling tests (≤0.5% of pixels may
        flip a discrete traversal decision via fp reassociation).  H=38, tile=4
        exercises the overlapping remainder band (duplicate-lane dropping) and
        seg_lanes=512 exercises multi-segment packing + tail padding."""
        _, scene = box_scene
        player = camera.Player(pos=np.array([16.0, 150.0, -10.0], np.float32), phi=-0.4)
        H, W = 38, 64
        cam = player.camera_params(W, H)
        params = sky.sky_params(1.0, 0.0)
        ref = tracer.render_sample(scene, cam, params, H, W, jnp.int32(3),
                                   tile_rows=4, tile_cols=None, want_depth=True)
        out = tracer.render_sample_compact(scene, cam, params, H, W, jnp.int32(3),
                                           tile_rows=4, tile_cols=None,
                                           seg_lanes=512, want_depth=True)
        for t, u in zip(out, ref):
            t, u = np.asarray(t), np.asarray(u)
            bad = np.abs(t - u).reshape(H, W, -1).max(axis=-1) > 1e-3
            assert bad.sum() <= H * W * 0.005, (
                f"{bad.sum()} divergent pixels at {np.argwhere(bad)[:20]}"
            )

    @pytest.mark.slow
    def test_water_interface(self):
        vol = np.zeros((16, 16, 384), np.uint8)
        vol[:, :, :100] = int(Block.STONE)
        vol[:, :, 100:128] = int(Block.WATER)
        chunks = vol.reshape(1, 16, 1, 16, 384).transpose(0, 2, 1, 3, 4)
        scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)
        # ray going straight down from above: hits water surface at y=128
        res = tracer.trace(
            scene, jnp.asarray([8.0]), jnp.asarray([200.0]), jnp.asarray([8.0]),
            jnp.asarray([0.0]), jnp.asarray([-1.0]), jnp.asarray([0.0]),
            jnp.full((1,), jnp.uint8(0)),
        )
        assert bool(res.hit[0])
        assert np.asarray(res.block)[0] == int(Block.WATER)
        assert abs(float(res.t[0]) - 72.0) < 0.01
        # ray inside water going up: exits at the water->air interface
        res2 = tracer.trace(
            scene, jnp.asarray([8.0]), jnp.asarray([110.0]), jnp.asarray([8.0]),
            jnp.asarray([0.0]), jnp.asarray([1.0]), jnp.asarray([0.0]),
            jnp.full((1,), jnp.uint8(int(Block.WATER))),
        )
        assert bool(res2.hit[0])
        assert np.asarray(res2.block)[0] == int(Block.AIR)
        assert abs(float(res2.t[0]) - 18.0) < 0.01
        # exit normal points out of the water (up)
        assert float(res2.ny[0]) == 1.0


@pytest.mark.slow
class TestAlphaCutoutParkResolve:
    """The DDA's park-and-resolve alpha test (the anyhit equivalent,
    basic_shaders.cu:1046-1068): rays through zero-alpha texels of flagged
    blocks pass through; opaque texels stop them.  Texel coordinates are read
    from the real atlas, so the expectations are data-driven."""

    pytestmark = pytest.mark.skipif(
        not __import__(
            "mega_minecraft_tpu.render.materials", fromlist=["HAS_REAL_ATLAS"]
        ).HAS_REAL_ATLAS,
        reason="needs the real texture atlas",
    )

    @staticmethod
    def _alpha_tile(block_id: int):
        from mega_minecraft_tpu.render.materials import TEX_DIFF_PACKED

        tile = (
            TEX_DIFF_PACKED.reshape(-1, 3, 8, 256)[block_id, 0, 0] >> np.uint32(24)
        ) & 1
        return tile.reshape(16, 16)  # [tv, tu]

    @staticmethod
    def _trace1(scene, o, d, medium=0):
        res = tracer.trace(
            scene,
            jnp.asarray([o[0]]), jnp.asarray([o[1]]), jnp.asarray([o[2]]),
            jnp.asarray([d[0]]), jnp.asarray([d[1]]), jnp.asarray([d[2]]),
            jnp.full((1,), jnp.uint8(medium)),
        )
        return bool(res.hit[0]), int(np.asarray(res.block)[0]), float(res.t[0])

    def test_leaf_block_cutout(self):
        """+x ray into a floating leaf block: a transparent entry-face texel lets
        the ray continue to the stone wall behind; an opaque one stops it."""
        leaf = int(Block.JUNGLE_LEAVES_PLAIN)
        tile = self._alpha_tile(leaf)
        vol = np.zeros((16, 16, 384), np.uint8)
        vol[8, 8, 200] = leaf
        vol[:, 12, :] = int(Block.STONE)  # wall behind the leaf
        chunks = vol.reshape(1, 16, 1, 16, 384).transpose(0, 2, 1, 3, 4)
        scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)

        # entry face is +x (on_xf): u = frac(hit z), v = 1 − frac(hit y)
        tv_t, tu_t = np.argwhere(tile == 0)[0]
        tv_o, tu_o = np.argwhere(tile == 1)[0]

        def ray_for(tv, tu):
            z = 8.0 + (tu + 0.5) / 16.0
            y = 200.0 + 1.0 - (tv + 0.5) / 16.0
            return (2.0, y, z), (1.0, 0.0, 0.0)

        o, d = ray_for(tv_t, tu_t)
        hit, block, t = self._trace1(scene, o, d)
        assert hit and block == int(Block.STONE), "transparent texel must pass"
        assert abs(t - 10.0) < 0.01
        o, d = ray_for(tv_o, tu_o)
        hit, block, t = self._trace1(scene, o, d)
        assert hit and block == leaf, "opaque texel must stop the ray"
        assert abs(t - 6.0) < 0.01

    def test_x_flora_cutout(self):
        """+x ray through an X-shaped tuft: both crossed quads transparent at the
        ray's uv → pass; opaque on the near quad → hit ON the quad."""
        tuft = int(Block.GRASS)
        tile = self._alpha_tile(tuft)
        vol = np.zeros((16, 16, 384), np.uint8)
        vol[8, 8, 150] = tuft
        vol[:, 12, :] = int(Block.STONE)
        chunks = vol.reshape(1, 16, 1, 16, 384).transpose(0, 2, 1, 3, 4)
        scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)

        # for a +x ray at z = 8 + fz: quad A's texel is tu_a = floor(fz·16),
        # quad B's is 15 − tu_a; v = 1 − frac(hit y) for both
        both_clear = next(
            (tv, tu) for tv in range(16) for tu in range(1, 15)
            if tile[tv, tu] == 0 and tile[tv, 15 - tu] == 0
        )
        near_opaque = next(
            (tv, tu) for tv in range(16) for tu in range(8)  # frac < 0.5 → A first
            if tile[tv, tu] == 1
        )

        def ray_for(tv, tu):
            z = 8.0 + (tu + 0.5) / 16.0
            y = 150.0 + 1.0 - (tv + 0.5) / 16.0
            return (2.0, y, z), (1.0, 0.0, 0.0)

        tv, tu = both_clear
        o, d = ray_for(tv, tu)
        hit, block, t = self._trace1(scene, o, d)
        assert hit and block == int(Block.STONE), "clear quads must pass"
        tv, tu = near_opaque
        o, d = ray_for(tv, tu)
        hit, block, t = self._trace1(scene, o, d)
        assert hit and block == tuft
        # quad A: x − z = 0 → hit at x = z → t = z − ox
        assert abs(t - (8.0 + (tu + 0.5) / 16.0 - 2.0)) < 0.01

    def test_consecutive_cutouts_resolve(self):
        """A ray crossing SEVERAL flagged voxels restarts the march each time:
        three leaf blocks in a row, all transparent at the ray's texel → the ray
        still reaches the wall."""
        leaf = int(Block.JUNGLE_LEAVES_PLAIN)
        tile = self._alpha_tile(leaf)
        tv, tu = np.argwhere(tile == 0)[0]
        vol = np.zeros((16, 16, 384), np.uint8)
        for x in (6, 8, 10):
            vol[8, x, 200] = leaf
        vol[:, 13, :] = int(Block.STONE)
        chunks = vol.reshape(1, 16, 1, 16, 384).transpose(0, 2, 1, 3, 4)
        scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)
        z = 8.0 + (tu + 0.5) / 16.0
        y = 200.0 + 1.0 - (tv + 0.5) / 16.0
        hit, block, t = self._trace1(scene, (2.0, y, z), (1.0, 0.0, 0.0))
        assert hit and block == int(Block.STONE)
        assert abs(t - 11.0) < 0.01


class TestSky:
    def test_energy_and_found_light(self):
        params = sky.sky_params(1.5, 0.0)
        sun = np.asarray(params.sun_dir)
        # looking directly at the sun: disk found, high radiance
        (r, g, b), found = sky.sky_color(
            jnp.asarray([sun[0]]), jnp.asarray([sun[1]]), jnp.asarray([sun[2]]), params
        )
        assert bool(found[0])
        assert float(r[0]) > 5.0
        # opposite direction: no disk, low radiance
        (r2, _, _), found2 = sky.sky_color(
            jnp.asarray([-sun[0]]), jnp.asarray([abs(sun[1])]), jnp.asarray([-sun[2]]), params
        )
        assert not bool(found2[0])
        assert float(r2[0]) < 1.0


class TestMeshing:
    def test_counts_and_visibility(self):
        blocks = np.zeros((16, 16, 384), np.uint8)
        blocks[:, :, :100] = int(Block.STONE)
        full = np.copy(blocks)
        mesh = meshing.mesh_chunk(blocks, {(1, 0): full, (-1, 0): full, (0, 1): full, (0, -1): full}, (0, 0))
        # top faces + bottom faces at the world floor (y=0 neighbor is out of range,
        # which the reference emits unconditionally, chunk.cu:1881): 512 quads
        assert mesh["positions"].shape[0] == 2048
        assert set(np.unique(mesh["normals"][:, 1])) == {-1.0, 1.0}

    def test_x_shaped(self):
        blocks = np.zeros((16, 16, 384), np.uint8)
        blocks[8, 8, 100] = int(Block.GRASS)
        mesh = meshing.mesh_chunk(blocks, {}, (0, 0))
        assert mesh["positions"].shape[0] == 8  # two crossed quads
        assert len(mesh["indices"]) == 12


class TestPost:
    def test_tonemap_range(self):
        hdr = jnp.asarray(np.random.RandomState(0).uniform(0, 10, (8, 8, 3)).astype(np.float32))
        out = np.asarray(tonemap.present(hdr))
        assert out.dtype == np.uint8

    def test_denoise_preserves_flat_regions(self):
        rng = np.random.RandomState(0)
        base = np.ones((32, 32, 3), np.float32) * 0.5
        noisy = base + rng.normal(0, 0.1, base.shape).astype(np.float32)
        albedo = jnp.asarray(base)
        normal = jnp.zeros_like(albedo).at[..., 1].set(1.0)
        out = np.asarray(denoise.atrous_denoise(jnp.asarray(noisy), albedo, normal))
        assert np.abs(out - base).std() < np.abs(noisy - base).std() * 0.5

    def test_denoise_psnr_floor(self):
        """Quality floor: on a noisy piecewise-flat scene with clean guides the
        à-trous filter must recover ≥ +6 dB PSNR over the noisy input."""
        rng = np.random.RandomState(1)
        base = np.zeros((64, 64, 3), np.float32) + 0.2
        base[:, 32:] = 0.7
        base[20:40, 10:30] = [0.8, 0.3, 0.2]
        albedo = jnp.asarray(base)
        normal = jnp.zeros_like(albedo).at[..., 1].set(1.0)
        noisy = base + rng.normal(0, 0.15, base.shape).astype(np.float32)
        out = denoise.atrous_denoise(jnp.asarray(noisy), albedo, normal)
        p_in = denoise.psnr(jnp.asarray(noisy), jnp.asarray(base))
        p_out = denoise.psnr(out, jnp.asarray(base))
        assert p_out > p_in + 6.0, (p_in, p_out)
        assert p_out > 28.0, p_out

    def test_denoise_preserves_edges(self):
        base = np.zeros((32, 32, 3), np.float32)
        base[:, 16:] = 1.0
        albedo = jnp.asarray(base)
        normal = jnp.zeros_like(albedo).at[..., 1].set(1.0)
        out = np.asarray(denoise.atrous_denoise(jnp.asarray(base), albedo, normal))
        # the hard edge survives (guide-weighted filter)
        assert out[:, 14].mean() < 0.2 and out[:, 18].mean() > 0.8


@pytest.mark.slow
class TestDebugRenderer:
    def test_direct_light_frame(self, box_scene):
        """One deterministic debug frame: finite, sky above horizon brighter than
        shadowed ground, identical across calls (it is noise-free)."""
        from mega_minecraft_tpu.render import debug_renderer

        _, scene = box_scene
        player = camera.Player(pos=np.array([16.0, 140.0, -8.0], np.float32), phi=-0.5)
        cam = player.camera_params(64, 48)
        params = sky.sky_params(1.0, 0.0)
        img1 = np.asarray(debug_renderer.render_debug(scene, cam, params, 48, 64))
        img2 = np.asarray(debug_renderer.render_debug(scene, cam, params, 48, 64))
        assert np.isfinite(img1).all()
        assert img1.min() >= 0.0
        np.testing.assert_array_equal(img1, img2)

    def test_tint_changes_output(self, box_scene):
        from mega_minecraft_tpu.render import debug_renderer

        _, scene = box_scene
        player = camera.Player(pos=np.array([16.0, 140.0, -8.0], np.float32), phi=-0.9)
        cam = player.camera_params(64, 48)
        params = sky.sky_params(1.0, 0.0)
        plain = np.asarray(debug_renderer.render_debug(scene, cam, params, 48, 64))
        tinted = np.asarray(
            debug_renderer.render_debug(scene, cam, params, 48, 64, tint="chunk")
        )
        assert (plain != tinted).any()


class TestXShapedFlora:
    """X-shaped flora are hit via their crossed diagonal quads (chunk.cu:1901-1935
    analogue) — they must be visible to the tracer but stop rays ON the quad."""

    def _scene_with_tuft(self):
        vol = np.zeros((32, 32, 384), np.uint8)
        vol[:, :, :100] = int(Block.STONE)
        vol[8, 8, 100] = int(Block.GRASS)  # X-shaped tuft on the surface
        chunks = vol.reshape(2, 16, 2, 16, 384).transpose(0, 2, 1, 3, 4)
        return brickmap.build_scene(jnp.asarray(chunks), 0, 0)

    def test_ray_through_tuft_hits_it(self):
        from mega_minecraft_tpu.render import tracer

        scene = self._scene_with_tuft()
        o = [jnp.full((1,), v, jnp.float32) for v in (8.5, 100.5, -2.0)]
        d = [jnp.full((1,), v, jnp.float32) for v in (0.0, 0.0, 1.0)]
        res = tracer.trace(scene, o[0], o[1], o[2], d[0], d[1], d[2],
                           jnp.zeros((1,), jnp.uint8))
        assert bool(res.hit[0])
        assert int(res.block[0]) == int(Block.GRASS)
        # stops on the quad inside the voxel, not at a face
        t = float(res.t[0])
        assert 10.0 < t < 11.0
        # quad normal is diagonal (|nx| == |nz| == 1/sqrt(2)), horizontal
        assert abs(abs(float(res.nx[0])) - 0.7071) < 1e-3
        assert abs(abs(float(res.nz[0])) - 0.7071) < 1e-3
        assert float(res.ny[0]) == 0.0

    def test_ray_above_tuft_misses(self):
        from mega_minecraft_tpu.render import tracer

        scene = self._scene_with_tuft()
        o = [jnp.full((1,), v, jnp.float32) for v in (8.5, 101.5, -2.0)]
        d = [jnp.full((1,), v, jnp.float32) for v in (0.0, 0.0, 1.0)]
        res = tracer.trace(scene, o[0], o[1], o[2], d[0], d[1], d[2],
                           jnp.zeros((1,), jnp.uint8))
        assert not bool(res.hit[0])


@pytest.mark.slow
class TestAlphaCutout:
    """anyhit alpha-test equivalent (basic_shaders.cu:1022-1052): rays pass
    through zero-alpha texels of X flora quads and leaf-block faces."""

    pytestmark = pytest.mark.skipif(
        not __import__("mega_minecraft_tpu.render.materials", fromlist=["x"]).HAS_REAL_ATLAS,
        reason="needs the real texture atlases (MMTPU_ATLAS_DIR)",
    )

    def test_ray_through_tuft_gap_passes(self):
        from mega_minecraft_tpu.render import tracer

        vol = np.zeros((32, 32, 384), np.uint8)
        vol[:, :, :100] = int(Block.STONE)
        vol[8, 8, 100] = int(Block.GRASS)
        chunks = vol.reshape(2, 16, 2, 16, 384).transpose(0, 2, 1, 3, 4)
        scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)
        # v near 0 (top of the tile): the tuft's top rows are fully transparent
        o = [jnp.full((1,), v, jnp.float32) for v in (8.5, 100.97, -2.0)]
        d = [jnp.full((1,), v, jnp.float32) for v in (0.0, 0.0, 1.0)]
        res = tracer.trace(scene, o[0], o[1], o[2], d[0], d[1], d[2],
                           jnp.zeros((1,), jnp.uint8))
        assert not bool(res.hit[0])  # grazes over the ground through the gap

    def test_leaf_holes_let_rays_through(self):
        from mega_minecraft_tpu.render import materials, tracer

        b = int(Block.BIRCH_LEAVES)
        tile = materials.TEX_DIFF_PACKED.reshape(-1, 3, 8, 16, 16)[b, 0, 0]
        alpha = ((tile >> np.uint32(24)) & 1).astype(bool)
        # pick one transparent and one opaque texel on the side face (z entry)
        tv_hole, tu_hole = [int(i[0]) for i in np.nonzero(~alpha)]
        tv_hit, tu_hit = [int(i[0]) for i in np.nonzero(alpha)]

        vol = np.zeros((32, 32, 384), np.uint8)
        vol[8, 8, 200] = b  # a single floating leaves block at (x=8, z=8, y=200)
        chunks = vol.reshape(2, 16, 2, 16, 384).transpose(0, 2, 1, 3, 4)
        scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)

        def shoot(tu, tv):
            x = 8.0 + (tu + 0.5) / 16.0
            y = 201.0 - (tv + 0.5) / 16.0
            o = [jnp.full((1,), v, jnp.float32) for v in (x, y, -2.0)]
            d = [jnp.full((1,), v, jnp.float32) for v in (0.0, 0.0, 1.0)]
            return tracer.trace(scene, o[0], o[1], o[2], d[0], d[1], d[2],
                                jnp.zeros((1,), jnp.uint8))

        assert not bool(shoot(tu_hole, tv_hole).hit[0])
        res = shoot(tu_hit, tv_hit)
        assert bool(res.hit[0]) and int(res.block[0]) == b


@pytest.mark.slow
class TestStochasticAlpha:
    """trace(alpha="stochastic"): bounce/shadow rays pass through alpha-flagged
    voxels with probability = the tile's transparent fraction (field bits 8-15,
    brickmap._encode) instead of parking for an exact texel test."""

    pytestmark = pytest.mark.skipif(
        not __import__(
            "mega_minecraft_tpu.render.materials", fromlist=["HAS_REAL_ATLAS"]
        ).HAS_REAL_ATLAS,
        reason="needs the real texture atlas",
    )

    def _leaf_slab_scene(self, leaf, layers=4):
        vol = np.zeros((16, 16, 384), np.uint8)
        vol[:, :, :50] = int(Block.STONE)
        vol[:, :, 100 : 100 + layers] = leaf
        chunks = vol.reshape(1, 16, 1, 16, 384).transpose(0, 2, 1, 3, 4)
        return brickmap.build_scene(jnp.asarray(chunks), 0, 0)

    def test_transmission_matches_fraction(self):
        from mega_minecraft_tpu.render.materials import ALPHA_T_FRAC
        from mega_minecraft_tpu.world.blocks import X_SHAPED_HI, X_SHAPED_LO

        nz = np.nonzero(ALPHA_T_FRAC)[0]
        leaf = int(
            next(b for b in nz if not (X_SHAPED_LO <= b < X_SHAPED_HI))
        )
        layers = 4
        scene = self._leaf_slab_scene(leaf, layers)
        T = ALPHA_T_FRAC[leaf] / 255.0

        H = W = 64
        ox = jnp.full((H, W), 8.0)
        oy = jnp.full((H, W), 150.0)
        oz = jnp.full((H, W), 8.0)
        dx = jnp.zeros((H, W))
        dy = jnp.full((H, W), -1.0)
        dz = jnp.zeros((H, W))
        med = jnp.zeros((H, W), jnp.uint8)
        seed = (
            jnp.arange(H * W, dtype=jnp.uint32) * jnp.uint32(2654435761)
        ).reshape(H, W)
        res = tracer.trace(
            scene, ox, oy, oz, dx, dy, dz, med, alpha="stochastic", seed=seed
        )
        blocks = np.asarray(res.block)
        through = (blocks == int(Block.STONE)).mean()
        expect = T**layers
        # 4096 Bernoulli trials: generous 5-sigma band
        tol = 5 * np.sqrt(expect * (1 - expect) / (H * W)) + 1e-3
        assert abs(through - expect) < tol, (through, expect, tol)
        # all rays resolve (hit the slab or the floor)
        assert bool(res.hit.all())

    def test_seed_required(self):
        scene = self._leaf_slab_scene(int(Block.STONE))
        one = jnp.ones((2, 2))
        with pytest.raises(ValueError):
            tracer.trace(
                scene, one * 8, one * 150, one * 8, one * 0, -one, one * 0,
                jnp.zeros((2, 2), jnp.uint8), alpha="stochastic",
            )

    def test_solid_voxel_skips_masked(self):
        """A stochastically passed-through lane advancing FROM a flagged solid
        voxel must take the exact cell exit, never a clearance skip read from
        the transparent-fraction byte: marching straight down through a slab
        whose T byte is large must still stop at the floor, not tunnel past."""
        from mega_minecraft_tpu.render.materials import ALPHA_T_FRAC
        from mega_minecraft_tpu.world.blocks import X_SHAPED_HI, X_SHAPED_LO

        nz = np.nonzero(ALPHA_T_FRAC)[0]
        leaf = int(
            max(
                (b for b in nz if not (X_SHAPED_LO <= b < X_SHAPED_HI)),
                key=lambda b: ALPHA_T_FRAC[b],
            )
        )
        scene = self._leaf_slab_scene(leaf, 8)
        H = W = 32
        ox = jnp.full((H, W), 8.0)
        oy = jnp.full((H, W), 150.0)
        oz = jnp.full((H, W), 8.0)
        seed = (
            jnp.arange(H * W, dtype=jnp.uint32) * jnp.uint32(747796405)
        ).reshape(H, W)
        res = tracer.trace(
            scene, ox, oy, oz, jnp.zeros((H, W)), jnp.full((H, W), -1.0),
            jnp.zeros((H, W)), jnp.zeros((H, W), jnp.uint8),
            alpha="stochastic", seed=seed,
        )
        blocks = np.asarray(res.block)
        t = np.asarray(res.t)
        # every lane stops at a leaf voxel or exactly on the floor (t = 100):
        # nothing lands inside the slab's air gaps or below the floor top
        assert bool(res.hit.all())
        floor = blocks == int(Block.STONE)
        assert np.allclose(t[floor], 100.0, atol=0.01)
        leaf_hit = blocks == leaf
        assert ((t[leaf_hit] >= 41.9) & (t[leaf_hit] <= 50.1)).all()

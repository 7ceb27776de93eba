"""Feature placement / application / decorator tests (synthetic single-biome
chunks, fixed seeds — SURVEY.md §4 strategy (b))."""

import numpy as np
import pytest

import jax.numpy as jnp

from mega_minecraft_tpu.terrain import decorators as dm
from mega_minecraft_tpu.terrain import feature_placement as fp
from mega_minecraft_tpu.terrain import features as fm
from mega_minecraft_tpu.world.biomes import Biome, CaveBiome
from mega_minecraft_tpu.world.blocks import Block
from mega_minecraft_tpu.world.features_data import Feature


def _jungle_inputs(B=1, height=150.0):
    hf = jnp.full((B, 16, 16), height, jnp.float32)
    w = jnp.zeros((B, 24, 16, 16), jnp.float32).at[:, int(Biome.JUNGLE)].set(1.0)
    layers = jnp.zeros((B, 20, 16, 16), jnp.float32)
    layers = layers.at[:, 15].set(140.0)  # DIRT band up to the surface
    for l in range(16, 20):
        layers = layers.at[:, l].set(height)
    cs = jnp.full((B, 16, 16, 32), 384, jnp.int32)
    ce = jnp.full((B, 16, 16, 32), 384, jnp.int32)
    cb = jnp.zeros((B, 16, 16, 32), jnp.int32)
    pos = jnp.asarray(np.array([[0, 0]], np.int32))
    return hf, w, layers, cs, ce, cb, pos


@pytest.fixture(scope="module")
def jungle():
    hf, w, layers, cs, ce, cb, pos = _jungle_inputs()
    pl = fp.generate_placements(hf, w, layers, cs, ce, cb, cb, pos)
    lists = fp.compact_placements(pl, pos)
    return hf, w, layers, cs, ce, cb, pos, pl, lists


class TestPlacement:
    def test_jungle_places_trees(self, jungle):
        *_, pl, lists = jungle
        feats = np.asarray(lists["surface"]["feature"])[0]
        feats = feats[feats > 0]
        assert len(feats) > 0
        assert set(feats).issubset(
            {int(Feature.RAFFLESIA), int(Feature.LARGE_JUNGLE_TREE),
             int(Feature.SMALL_JUNGLE_TREE), int(Feature.TINY_JUNGLE_TREE)}
        )

    def test_placements_deterministic(self, jungle):
        hf, w, layers, cs, ce, cb, pos, pl, _ = jungle
        pl2 = fp.generate_placements(hf, w, layers, cs, ce, cb, cb, pos)
        np.testing.assert_array_equal(
            np.asarray(pl["surface_feature"]), np.asarray(pl2["surface_feature"])
        )

    def test_top_layer_constraint_blocks_placement(self):
        # no DIRT under the surface -> jungle trees can't place
        hf, w, layers, cs, ce, cb, pos = _jungle_inputs()
        layers = jnp.zeros((1, 20, 16, 16), jnp.float32)  # all stone, zero dirt band
        pl = fp.generate_placements(hf, w, layers, cs, ce, cb, cb, pos)
        assert (np.asarray(pl["surface_feature"]) == 0).all()

    def test_is_feature_pos_unique_per_cell(self):
        # exactly one position per grid cell passes
        wx, wz = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        hits = np.asarray(
            fp.is_feature_pos(
                jnp.asarray(wx, jnp.int32), jnp.asarray(wz, jnp.int32),
                jnp.int32(16), jnp.int32(2), jnp.int32(12345),
            )
        )
        # 4x4 grid cells of size 16 in a 64x64 window
        assert hits.sum() == 16


class TestApply:
    def test_trees_materialize(self, jungle):
        hf, w, layers, cs, ce, cb, pos, pl, lists = jungle
        blocks = np.zeros((16, 16, 384), np.uint8)
        blocks[:, :, :151] = int(Block.STONE)
        surf = {k: v[0] for k, v in lists["surface"].items()}
        cave = {k: v[0] for k, v in lists["cave"].items()}
        out = np.asarray(
            fm.apply_features_chunk(jnp.asarray(blocks), surf, cave, pos[0], hf[0])
        )
        new = out[out != blocks]
        assert int(Block.JUNGLE_WOOD) in new

    def test_cannot_replace_respected(self, jungle):
        hf, w, layers, cs, ce, cb, pos, pl, lists = jungle
        # all-solid volume: canReplaceBlocks=True features may still write, but
        # blocks stay put for placements that cannot replace. Jungle trees CAN
        # replace, so check a Tianzi pine instead (canReplaceBlocks=False).
        surf = {
            "feature": jnp.asarray([int(Feature.PINE_TREE)] + [0] * 63, jnp.int32),
            "x": jnp.asarray([8] + [0] * 63, jnp.int32),
            "y": jnp.asarray([151] + [0] * 63, jnp.int32),
            "z": jnp.asarray([8] + [0] * 63, jnp.int32),
            "replace": jnp.zeros(64, jnp.int32),
        }
        cave = {k: jnp.zeros(128, jnp.int32) for k in ("feature", "x", "y", "z", "height", "replace")}
        blocks = np.full((16, 16, 384), int(Block.STONE), np.uint8)
        out = np.asarray(
            fm.apply_features_chunk(jnp.asarray(blocks), surf, cave, pos[0], hf[0])
        )
        np.testing.assert_array_equal(out, blocks)  # nothing replaced

    def test_cave_feature_applies(self):
        # a glowstone cluster on a cave ceiling
        cave = {
            "feature": jnp.asarray([4] + [0] * 127, jnp.int32),  # GLOWSTONE_CLUSTER
            "x": jnp.asarray([8] + [0] * 127, jnp.int32),
            "y": jnp.asarray([101] + [0] * 127, jnp.int32),
            "z": jnp.asarray([8] + [0] * 127, jnp.int32),
            "height": jnp.asarray([20] + [0] * 127, jnp.int32),
            "replace": jnp.ones(128, jnp.int32),
        }
        surf = {k: jnp.zeros(64, jnp.int32) for k in ("feature", "x", "y", "z", "replace")}
        blocks = np.zeros((16, 16, 384), np.uint8)
        pos = jnp.asarray(np.array([0, 0], np.int32))
        hf = jnp.full((16, 16), 150.0, jnp.float32)
        out = np.asarray(
            fm.apply_features_chunk(jnp.asarray(blocks), surf, cave, pos, hf)
        )
        assert (out == int(Block.GLOWSTONE)).sum() > 0
        # cluster hangs at the ceiling (y near 121)
        ys = np.nonzero(out == int(Block.GLOWSTONE))[2]
        assert ys.min() >= 110


class TestDecorators:
    def test_plains_flora(self):
        B = 1
        hf = jnp.full((16, 16), 150.0, jnp.float32)
        w = jnp.zeros((24, 16, 16), jnp.float32).at[int(Biome.PLAINS)].set(1.0)
        cs = jnp.full((16, 16, 32), 384, jnp.int32)
        ce = jnp.full((16, 16, 32), 384, jnp.int32)
        cb = jnp.zeros((16, 16, 32), jnp.int32)
        blocks = np.zeros((16, 16, 384), np.uint8)
        blocks[:, :, :150] = int(Block.STONE)
        blocks[:, :, 150] = int(Block.GRASS_BLOCK)
        pos = jnp.asarray(np.array([0, 0], np.int32))
        out = np.asarray(
            dm.place_decorators(jnp.asarray(blocks), hf, w, cs, ce, cb, pos)
        )
        new_ids = set(np.unique(out[out != blocks]))
        flora = {int(Block.GRASS), int(Block.DANDELION), int(Block.POPPY),
                 int(Block.RED_TULIP), int(Block.ORANGE_TULIP), int(Block.WHITE_TULIP),
                 int(Block.PINK_TULIP)}
        assert new_ids & flora
        # all decorators sit directly on the grass (y = 151)
        ys = np.nonzero(out != blocks)[2]
        assert (ys == 151).all()

    def test_deterministic(self):
        hf = jnp.full((16, 16), 150.0, jnp.float32)
        w = jnp.zeros((24, 16, 16), jnp.float32).at[int(Biome.PLAINS)].set(1.0)
        cs = jnp.full((16, 16, 32), 384, jnp.int32)
        ce = jnp.full((16, 16, 32), 384, jnp.int32)
        cb = jnp.zeros((16, 16, 32), jnp.int32)
        blocks = np.zeros((16, 16, 384), np.uint8)
        blocks[:, :, :150] = int(Block.STONE)
        blocks[:, :, 150] = int(Block.GRASS_BLOCK)
        pos = jnp.asarray(np.array([32, -64], np.int32))
        o1 = np.asarray(dm.place_decorators(jnp.asarray(blocks), hf, w, cs, ce, cb, pos))
        o2 = np.asarray(dm.place_decorators(jnp.asarray(blocks), hf, w, cs, ce, cb, pos))
        np.testing.assert_array_equal(o1, o2)


@pytest.mark.slow
class TestAreaEquality:
    """apply_features_area must reproduce the per-chunk gathered path exactly:
    same winners per voxel (spiral-rank priority), same border clipping.
    Slow tier, TPU-only: generate_placements + the full-registry feature switch
    compile in minutes on TPU but XLA:CPU needs >68 GB / hours (measured twice).
    The same contract is CPU-checkable via synthetic lists + trimmed registry —
    see TestAreaEqualitySynthetic below and _verify_area_cpu.py."""

    @pytest.fixture(autouse=True)
    def _tpu_only(self):
        import jax

        if jax.default_backend() == "cpu":
            pytest.skip("XLA:CPU compile of generate_placements needs >68 GB")

    def _gathered_reference(self, blocks, lists, pos, ncx, ncz):
        """The pre-area pipeline: per-chunk 49-gather + apply_features_batch."""
        from mega_minecraft_tpu.world import biomes as bio2

        n = ncz * ncx
        nb_idx = np.zeros((n, len(fp.GATHER_OFFSETS)), np.int32)
        nb_ok = np.zeros((n, len(fp.GATHER_OFFSETS)), bool)
        for ci in range(n):
            iz, ix = divmod(ci, ncx)
            for oi, o in enumerate(fp.GATHER_OFFSETS):
                jx, jz = ix + int(o[0]), iz + int(o[1])
                if 0 <= jx < ncx and 0 <= jz < ncz:
                    nb_idx[ci, oi] = jz * ncx + jx
                    nb_ok[ci, oi] = True
        nbi = jnp.asarray(nb_idx)
        mask = jnp.asarray(nb_ok)[..., None]

        def nb_lists(per_chunk):
            out = {k: v[nbi] for k, v in per_chunk.items()}
            out["feature"] = jnp.where(mask, out["feature"], 0)
            return out

        surf = fp.gather_from_neighborhood_batch(
            nb_lists(lists["surface"]), bio2.MAX_GATHERED_FEATURES_PER_CHUNK
        )
        cave = fp.gather_from_neighborhood_batch(
            nb_lists(lists["cave"]), bio2.MAX_GATHERED_CAVE_FEATURES_PER_CHUNK
        )
        hf = jnp.zeros((n, 16, 16), jnp.float32)
        return np.asarray(fm.apply_features_batch(blocks, surf, cave, pos, hf))

    def test_area_matches_gathered(self):
        """2x2 area, real jungle placements in every chunk (trees overhang chunk
        borders, so cross-chunk writes + spiral priority are exercised)."""
        ncx = ncz = 2
        B = ncx * ncz
        hf = jnp.full((B, 16, 16), 150.0, jnp.float32)
        w = jnp.zeros((B, 24, 16, 16), jnp.float32).at[:, int(Biome.JUNGLE)].set(1.0)
        layers = jnp.zeros((B, 20, 16, 16), jnp.float32)
        layers = layers.at[:, 15].set(140.0)
        for l in range(16, 20):
            layers = layers.at[:, l].set(150.0)
        cs = jnp.full((B, 16, 16, 32), 384, jnp.int32)
        ce = jnp.full((B, 16, 16, 32), 384, jnp.int32)
        cb = jnp.zeros((B, 16, 16, 32), jnp.int32)
        pos = jnp.asarray(
            np.array([[0, 0], [16, 0], [0, 16], [16, 16]], np.int32)
        )
        pl = fp.generate_placements(hf, w, layers, cs, ce, cb, cb, pos)
        lists = fp.compact_placements(pl, pos)
        n_src = int((np.asarray(lists["surface"]["feature"]) > 0).sum())
        assert n_src >= 2, "need real placements for a meaningful test"

        blocks = np.zeros((B, 16, 16, 384), np.uint8)
        blocks[:, :, :, :151] = int(Block.STONE)
        blocks = jnp.asarray(blocks)

        ref = self._gathered_reference(blocks, lists, pos, ncx, ncz)
        area = np.asarray(
            fm.apply_features_area(blocks, lists["surface"], lists["cave"], pos, ncx, ncz)
        )
        n_feat = int((ref != np.asarray(blocks)).sum())
        assert n_feat > 50, f"vacuous: only {n_feat} feature blocks written"
        np.testing.assert_array_equal(area, ref)

    def test_area_cave_matches_gathered(self):
        """Cave features (mushroom cave biome) through the area path."""
        ncx, ncz = 2, 1
        B = 2
        hf = jnp.full((B, 16, 16), 150.0, jnp.float32)
        w = jnp.zeros((B, 24, 16, 16), jnp.float32).at[:, int(Biome.PLAINS)].set(1.0)
        layers = jnp.zeros((B, 20, 16, 16), jnp.float32)
        for l in range(15, 20):
            layers = layers.at[:, l].set(150.0)
        cs = jnp.full((B, 16, 16, 32), 384, jnp.int32).at[:, :, :, 0].set(60)
        ce = jnp.full((B, 16, 16, 32), 384, jnp.int32).at[:, :, :, 0].set(90)
        cb = jnp.full((B, 16, 16, 32), int(CaveBiome.MUSHROOM_CAVES), jnp.int32)
        pos = jnp.asarray(np.array([[0, 0], [16, 0]], np.int32))
        pl = fp.generate_placements(hf, w, layers, cs, ce, cb, cb, pos)
        lists = fp.compact_placements(pl, pos)
        n_src = int((np.asarray(lists["cave"]["feature"]) > 0).sum())
        assert n_src >= 1, "no cave placements generated"

        blocks = np.zeros((B, 16, 16, 384), np.uint8)
        blocks[:, :, :, :151] = int(Block.STONE)
        for b in range(B):
            blocks[b, :, :, 61:91] = 0  # carve the cave layer
        blocks = jnp.asarray(blocks)

        ref = self._gathered_reference(blocks, lists, pos, ncx, ncz)
        area = np.asarray(
            fm.apply_features_area(blocks, lists["surface"], lists["cave"], pos, ncx, ncz)
        )
        n_feat = int((ref != np.asarray(blocks)).sum())
        assert n_feat > 0, "vacuous: no cave feature blocks written"
        np.testing.assert_array_equal(area, ref)


@pytest.mark.slow
class TestAreaEqualitySynthetic:
    """CPU-tractable variant of TestAreaEquality: synthetic placement lists (no
    generate_placements compile) + SDF registries trimmed to the two lightest
    geometry fns.  The geometry is shared verbatim by both paths; what the area
    refactor changes — spiral-rank/slot priority, cross-chunk overhang writes,
    border clipping, replace semantics, surface-over-cave arbitration — is fully
    exercised.  (Same scenario as _verify_area_cpu.py.)"""

    def test_area_matches_gathered_synthetic(self):
        import jax

        from mega_minecraft_tpu.terrain import features_sdf as sdf
        from mega_minecraft_tpu.world import biomes as bio2
        from mega_minecraft_tpu.world.features_data import CaveFeature

        old_s, old_c = sdf.SURFACE_FEATURE_FNS, sdf.CAVE_FEATURE_FNS
        sdf.SURFACE_FEATURE_FNS = {
            int(Feature.SPHERE): old_s[int(Feature.SPHERE)]
        }
        sdf.CAVE_FEATURE_FNS = {
            int(CaveFeature.TEST_GLOWSTONE_PILLAR):
                old_c[int(CaveFeature.TEST_GLOWSTONE_PILLAR)]
        }
        jax.clear_caches()
        try:
            ncx = ncz = 2
            B = 4
            pos = jnp.asarray(np.array([[0, 0], [16, 0], [0, 16], [16, 16]], np.int32))
            SP, PIL = int(Feature.SPHERE), int(CaveFeature.TEST_GLOWSTONE_PILLAR)
            surf = {k: np.zeros((B, 64), np.int32)
                    for k in ("feature", "x", "y", "z", "replace")}
            cave = {k: np.zeros((B, 128), np.int32)
                    for k in ("feature", "x", "y", "z", "replace", "height")}
            surf_entries = [
                [(SP, 14, 150, 14, 0), (SP, 12, 150, 12, 0), (SP, 4, 144, 4, 1),
                 (SP, 8, 92, 8, 0)],
                [(SP, 18, 150, 14, 0)],
                [],
                [(SP, 18, 150, 18, 0)],
            ]
            cave_entries = [[(PIL, 8, 60, 8, 0, 30)], [], [(PIL, 24, 60, 8, 0, 25)], []]
            for b, entries in enumerate(surf_entries):
                for s, (f, x, y, z, r) in enumerate(entries):
                    surf["feature"][b, s] = f
                    surf["x"][b, s], surf["y"][b, s], surf["z"][b, s] = x, y, z
                    surf["replace"][b, s] = r
            for b, entries in enumerate(cave_entries):
                for s, (f, x, y, z, r, h) in enumerate(entries):
                    cave["feature"][b, s] = f
                    cave["x"][b, s], cave["y"][b, s], cave["z"][b, s] = x, y, z
                    cave["replace"][b, s], cave["height"][b, s] = r, h
            surf = {k: jnp.asarray(v) for k, v in surf.items()}
            cave = {k: jnp.asarray(v) for k, v in cave.items()}

            blocks = np.zeros((B, 16, 16, 384), np.uint8)
            blocks[:, :, :, :146] = int(Block.STONE)
            blocks[:, :, :, 60:91] = 0
            blocks = jnp.asarray(blocks)

            # gathered reference (the pre-area pipeline)
            n = ncz * ncx
            nb_idx = np.zeros((n, len(fp.GATHER_OFFSETS)), np.int32)
            nb_ok = np.zeros((n, len(fp.GATHER_OFFSETS)), bool)
            for ci in range(n):
                iz, ix = divmod(ci, ncx)
                for oi, o in enumerate(fp.GATHER_OFFSETS):
                    jx, jz = ix + int(o[0]), iz + int(o[1])
                    if 0 <= jx < ncx and 0 <= jz < ncz:
                        nb_idx[ci, oi] = jz * ncx + jx
                        nb_ok[ci, oi] = True
            nbi = jnp.asarray(nb_idx)
            mask = jnp.asarray(nb_ok)[..., None]

            def nb_lists(per_chunk):
                out = {k: v[nbi] for k, v in per_chunk.items()}
                out["feature"] = jnp.where(mask, out["feature"], 0)
                return out

            gs = fp.gather_from_neighborhood_batch(
                nb_lists(surf), bio2.MAX_GATHERED_FEATURES_PER_CHUNK
            )
            gc = fp.gather_from_neighborhood_batch(
                nb_lists(cave), bio2.MAX_GATHERED_CAVE_FEATURES_PER_CHUNK
            )
            hf = jnp.zeros((n, 16, 16), jnp.float32)
            ref = np.asarray(fm.apply_features_batch(blocks, gs, gc, pos, hf))
            area = np.asarray(fm.apply_features_area(blocks, surf, cave, pos, ncx, ncz))

            base = np.asarray(blocks)
            assert int((ref != base).sum()) > 200, "vacuous"
            assert int((ref[1:] != base[1:]).sum()) > 10, "no cross-chunk overhang"
            np.testing.assert_array_equal(area, ref)
        finally:
            sdf.SURFACE_FEATURE_FNS, sdf.CAVE_FEATURE_FNS = old_s, old_c
            jax.clear_caches()


@pytest.mark.slow
class TestWindows:
    """Application windows (features.SURFACE_XZ_RADIUS / CAVE_WINDOWS) must
    DOMINATE each SDF's geometric extent — a too-small window clips the feature
    and silently drops blocks.  Probes each builder at random placements over a
    grid wider than its declared window (tools/sdf_extents.py methodology)."""

    def _probe(self, fn, cave, radius, n_seeds=24):
        from mega_minecraft_tpu.ops import hashes
        from mega_minecraft_tpu.terrain import features_sdf as sdf

        import jax

        R = radius + 8
        I32, F32 = jnp.int32, jnp.float32
        gx = jnp.arange(-R, R + 1, dtype=I32)
        gy = jnp.arange(-16, 150, dtype=I32)
        fx = gx[None, :, None].astype(F32)
        fz = gx[:, None, None].astype(F32)
        fy = gy[None, None, :].astype(F32)
        brng0 = hashes.seed_3(jnp.zeros((), I32), jnp.zeros((), I32), 7777)

        @jax.jit
        def one(px, py, pz, lh):
            stream = sdf.draw_stream(px, py, pz, 12345)
            wx = px + fx.astype(I32)
            wy = py + fy.astype(I32)
            wz = pz + fz.astype(I32)
            extra = {"fy_pos": py, "fpos": (px, py, pz), "layer_height": lh}
            hit, _, _ = fn(stream, fx, fy, fz, wx, wy, wz, brng0, extra)
            hit = jnp.broadcast_to(hit, (2 * R + 1, 2 * R + 1, 166))
            return hit.any(axis=2)

        rng = np.random.default_rng(3)
        worst = 0
        for _ in range(n_seeds):
            h = np.asarray(
                one(
                    jnp.asarray(int(rng.integers(-9000, 9000)), jnp.int32),
                    jnp.asarray(int(rng.integers(30, 240)), jnp.int32),
                    jnp.asarray(int(rng.integers(-9000, 9000)), jnp.int32),
                    jnp.asarray(int(rng.integers(4, 120)) if cave else 0, jnp.int32),
                )
            )
            zs, xs = np.where(h)
            if xs.size:
                worst = max(worst, int(np.abs(xs - R).max()), int(np.abs(zs - R).max()))
        return worst

    @pytest.mark.parametrize("fid", sorted(__import__("mega_minecraft_tpu.terrain.features_sdf", fromlist=["x"]).SURFACE_FEATURE_FNS))
    def test_surface_window_dominates(self, fid):
        from mega_minecraft_tpu.terrain import features_sdf as sdf

        r = fm.SURFACE_XZ_RADIUS[fid]
        worst = self._probe(sdf.SURFACE_FEATURE_FNS[fid], cave=False, radius=r)
        assert worst <= r, (fid, worst, r)

    @pytest.mark.parametrize("fid", sorted(__import__("mega_minecraft_tpu.terrain.features_sdf", fromlist=["x"]).CAVE_FEATURE_FNS))
    def test_cave_window_dominates(self, fid):
        from mega_minecraft_tpu.terrain import features_sdf as sdf

        r = fm.CAVE_WINDOWS[fid][0]
        worst = self._probe(sdf.CAVE_FEATURE_FNS[fid], cave=True, radius=r)
        assert worst <= r, (fid, worst, r)

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

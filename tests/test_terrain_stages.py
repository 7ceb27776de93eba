"""Per-stage array-level tests for the generation pipeline (SURVEY.md §4 strategy:
fixed seeds / chunk coordinates, structural invariants per stage)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mega_minecraft_tpu.terrain import caves as caves_mod
from mega_minecraft_tpu.terrain import erosion, gather, heightfield, layers
from mega_minecraft_tpu.world import biomes as bio


@pytest.fixture(scope="module")
def hf_3x3():
    """heightfield + weights for the 3x3 chunk neighborhood around chunk (0, 0)."""
    pos = []
    for cz in (-1, 0, 1):
        for cx in (-1, 0, 1):
            pos.append([cx * 16, cz * 16])
    pos = jnp.asarray(np.array(pos, np.int32))
    h, w = heightfield.generate_heightfield(pos)
    h = np.asarray(h).reshape(3, 3, 16, 16)
    w = np.asarray(w).reshape(3, 3, 24, 16, 16)
    return h, w


class TestHeightfield:
    def test_shapes_and_ranges(self, hf_3x3):
        h, w = hf_3x3
        assert h.shape == (3, 3, 16, 16)
        assert (h > 0).all() and (h < 384).all()
        assert (w >= 0).all()
        # weights are multiplicative in [0,1] factors
        assert (w <= 1.0 + 1e-5).all()

    def test_deterministic(self):
        h1, w1 = heightfield.heightfield_single(7, -3)
        h2, w2 = heightfield.heightfield_single(7, -3)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    def test_continuity_across_chunk_border(self, hf_3x3):
        # adjacent chunk columns are spatially adjacent -> heights nearly continuous
        h, _ = hf_3x3
        grid = h.transpose(0, 2, 1, 3).reshape(48, 48)
        assert np.abs(np.diff(grid, axis=0)).max() < 40.0
        assert np.abs(np.diff(grid, axis=1)).max() < 40.0
        # no seam artifacts: border diffs comparable to interior diffs
        interior = np.abs(np.diff(grid, axis=1))[:, :15].max()
        seam = np.abs(grid[:, 16] - grid[:, 15]).max()
        assert seam < max(4 * interior, 10.0)

    def test_biome_override(self):
        pos = jnp.asarray(np.array([[0, 0]], np.int32))
        h, w = heightfield.generate_heightfield(
            pos, biome_override=int(bio.Biome.PLAINS)
        )
        w = np.asarray(w)[0]
        assert (w[int(bio.Biome.PLAINS)] == 1.0).all()
        assert w.sum(axis=0).max() == 1.0


class TestLayers:
    @pytest.fixture(scope="class")
    def layer_out(self, hf_3x3):
        h, w = hf_3x3
        gathered = gather.gather_heightfield_3x3(jnp.asarray(h))[None]
        weights = jnp.asarray(w[1, 1][None])
        pos = jnp.asarray(np.array([[0, 0]], np.int32))
        out = layers.generate_layers(gathered, weights, pos)
        return np.asarray(out)[0], h[1, 1]

    def test_forward_monotonic(self, layer_out):
        ls, h = layer_out
        n_fwd = bio.NUM_FORWARD_MATERIALS
        assert (ls[0] == 0).all()
        for l in range(1, n_fwd):
            assert (ls[l] >= ls[l - 1] - 1e-4).all()

    def test_eroded_below_heightfield(self, layer_out):
        ls, h = layer_out
        n_strat = bio.NUM_STRATIFIED_MATERIALS
        prev = h
        for l in range(bio.NUM_MATERIALS - 1, n_strat - 1, -1):
            assert (ls[l] <= prev + 1e-4).all()
            prev = ls[l]

    def test_material_weight_matmul(self, hf_3x3):
        _, w = hf_3x3
        tmw = np.asarray(layers.total_material_weights(jnp.asarray(w[1, 1][None])))[0]
        want = np.einsum("czx,cm->mzx", w[1, 1], bio.BIOME_MATERIAL_WEIGHTS)
        np.testing.assert_allclose(tmw, want, rtol=1e-5, atol=1e-5)


class TestErosion:
    def test_angle_of_repose_fixpoint(self):
        # synthetic zone: a sharp 60-block cliff in the top eroded layer (SNOW)
        g = np.zeros((9, 384, 384), np.float32)
        hf = np.full((384, 384), 200.0, np.float32)
        hf[:, 192:] = 140.0
        # layer starts: all at hf - 2 for the top layer (some thickness), others at hf
        for l in range(8):
            g[l] = hf - (8 - l) * 0.5  # thin stacked layers
        g[8] = hf
        out = np.asarray(erosion.erode_zone(jnp.asarray(g)))
        # convergence: top-layer starts must satisfy the angle-of-repose bound
        # (neighbor difference <= tan(repose) * dist) wherever thickness positive
        snow_tan = bio.MATERIAL_AMPLITUDE_OR_TAN_REPOSE[int(bio.Material.SNOW)]
        s = out[7]
        interior_ok = s[1:-1, 1:-1] >= np.maximum(
            s[1:-1, :-2], s[1:-1, 2:]
        ) - snow_tan * 1.0001 - 1e-3
        # the bound may fail only where deposition is clamped by the layer end
        # (newLayerStart = min(newLayerStart, thisLayerEnd), chunk.cu:574)
        clamped = s[1:-1, 1:-1] >= out[8][1:-1, 1:-1] - 1e-3
        assert (interior_ok | clamped).all()
        assert interior_ok.mean() > 0.99
        # heightfield slot untouched
        np.testing.assert_array_equal(out[8], g[8])

    def test_no_change_when_flat(self):
        g = np.zeros((9, 384, 384), np.float32)
        for l in range(8):
            g[l] = 100.0 + l
        g[8] = 110.0
        out = np.asarray(erosion.erode_zone(jnp.asarray(g)))
        np.testing.assert_allclose(out, g, atol=1e-5)

    def test_gather_scatter_roundtrip(self):
        rng = np.random.RandomState(0)
        lg = rng.uniform(0, 100, (24, 24, 20, 16, 16)).astype(np.float32)
        hf = rng.uniform(100, 200, (24, 24, 16, 16)).astype(np.float32)
        g = np.asarray(erosion.gather_zone_layers(jnp.asarray(lg), jnp.asarray(hf)))
        assert g.shape == (9, 384, 384)
        # slot 8 equals assembled heightfield
        full_hf = hf.transpose(0, 2, 1, 3).reshape(384, 384)
        np.testing.assert_array_equal(g[8], full_hf)
        # scatter back with unmodified g restores the core chunks
        core = lg[6:18, 6:18]
        out = np.asarray(
            erosion.scatter_zone_layers(jnp.asarray(core), jnp.asarray(g))
        )
        np.testing.assert_allclose(out, core, atol=0)

    def test_fix_backward_stratified(self):
        ls = np.zeros((1, 20, 16, 16), np.float32)
        ls[0, 10] = 5.0  # cumulative thickness RED_SANDSTONE+SANDSTONE
        ls[0, 11] = 3.5  # cumulative thickness SANDSTONE
        ls[0, 12] = 100.0  # eroded base start
        out = np.asarray(layers.fix_backward_stratified(jnp.asarray(ls)))
        assert (out[0, 10] == 95.0).all()
        assert (out[0, 11] == 96.5).all()


class TestCaves:
    @pytest.fixture(scope="class")
    def cave_out(self):
        pos = jnp.asarray(np.array([[0, 0]], np.int32))
        h, w = heightfield.generate_heightfield(pos)
        out = caves_mod.generate_caves(h, w, pos)
        return {k: np.asarray(v) for k, v in out.items()}, np.asarray(h)[0]

    def test_layer_structure(self, cave_out):
        out, h = cave_out
        starts = out["starts"][0]
        ends = out["ends"][0]
        assert starts.shape == (16, 16, 32)
        valid = starts != 384
        # start < end when the layer exists and has a top
        both = valid & (ends != 384)
        assert (starts[both] < ends[both]).all()
        # layers are sorted ascending per column
        for z in range(0, 16, 5):
            for x in range(0, 16, 5):
                s = starts[z, x][valid[z, x]]
                assert (np.diff(s) > 0).all()

    def test_topmost_layer_reaches_sky(self, cave_out):
        # every column's last valid layer must end at 384 (air above terrain)
        out, h = cave_out
        starts = out["starts"][0]
        ends = out["ends"][0]
        for z in range(16):
            for x in range(16):
                v = starts[z, x] != 384
                assert v.any()  # at least the above-surface air run
                last = np.where(v)[0].max()
                assert ends[z, x][last] == 384

    def test_biomes_valid(self, cave_out):
        out, _ = cave_out
        assert (out["bottom_biome"] >= 0).all()
        assert (out["bottom_biome"] < bio.NUM_CAVE_BIOMES).all()
        assert (out["top_biome"] >= 0).all()
        assert (out["top_biome"] < bio.NUM_CAVE_BIOMES).all()

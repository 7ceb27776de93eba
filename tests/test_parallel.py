"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
determinism across shardings — same seed ⇒ identical outputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mega_minecraft_tpu.parallel import sharding
from mega_minecraft_tpu.terrain import erosion
from mega_minecraft_tpu.world.biomes import Biome


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return sharding.make_mesh(8, platform="cpu")


class TestShardedErosion:
    def test_matches_single_device(self, mesh):
        g = np.zeros((9, 384, 384), np.float32)
        hf = np.full((384, 384), 200.0, np.float32)
        hf[:, 192:] = 150.0
        hf[100:140, :] += 20.0
        for l in range(8):
            g[l] = hf - (8 - l) * 0.8
        g[8] = hf
        single = np.asarray(erosion.erode_zone(jnp.asarray(g)))
        shard = np.asarray(sharding.erode_zone_sharded(mesh, jnp.asarray(g)))
        # same least fixpoint; iteration schedules differ only transiently
        np.testing.assert_allclose(shard, single, atol=2e-3)

    def test_flat_zone_untouched(self, mesh):
        g = np.zeros((9, 384, 384), np.float32)
        for l in range(8):
            g[l] = 100.0 + l
        g[8] = 110.0
        out = np.asarray(sharding.erode_zone_sharded(mesh, jnp.asarray(g)))
        np.testing.assert_allclose(out, g, atol=1e-5)


class TestShardedRender:
    @pytest.mark.slow  # compiles the tracer on XLA:CPU (minutes on a small host)
    def test_matches_single_device(self, mesh):
        """8-shard shard_map render must match the single-device frame to float-ulp
        tolerance (rays are keyed by global pixel coords; each shard tiles locally —
        the only divergence is XLA re-association differences between the shard_map
        and plain-jit compilations, measured ≤4e-6 on <3% of pixels)."""
        from mega_minecraft_tpu.render import brickmap, camera, tracer
        from mega_minecraft_tpu.render import sky as sky_mod
        from mega_minecraft_tpu.world.blocks import Block

        vol = np.zeros((1, 1, 16, 16, 384), np.uint8)
        vol[..., :100] = int(Block.STONE)
        vol[..., 99:100] = int(Block.GRASS_BLOCK)
        vol[0, 0, 6:10, 6:10, 100:104] = int(Block.STONE)
        with jax.default_device(jax.devices("cpu")[0]):
            scene = brickmap.build_scene(jnp.asarray(vol), 0, 0)
            H, W = 16, 32
            player = camera.Player(pos=np.array([8.0, 120.0, -10.0], np.float32), phi=-0.5)
            cam = player.camera_params(W, H)
            params = sky_mod.sky_params(1.0, 0.0)
            single = tracer.render_sample(
                scene, cam, params, H, W, jnp.int32(3), tile_rows=2, tile_cols=None
            )
        shard = sharding.sharded_render(
            mesh, scene, cam, params, H, W, jnp.int32(3), tile_rows=2, tile_cols=None
        )
        for s, g in zip(single, shard):
            np.testing.assert_allclose(
                np.asarray(s), np.asarray(g), atol=1e-5, rtol=5e-5
            )

    @pytest.mark.slow  # compiles the tracer on XLA:CPU (minutes on a small host)
    def test_compact_matches_single_device(self, mesh):
        """The compacted bounce loop under shard_map: each device partitions its
        OWN band's rays (argsort/scatter are shard-local, no collectives); the
        assembled frame matches the single-device compacted render to the same
        cross-compilation tolerance as the band renderer."""
        from mega_minecraft_tpu.render import brickmap, camera, tracer
        from mega_minecraft_tpu.render import sky as sky_mod
        from mega_minecraft_tpu.world.blocks import Block

        vol = np.zeros((1, 1, 16, 16, 384), np.uint8)
        vol[..., :100] = int(Block.STONE)
        vol[..., 99:100] = int(Block.GRASS_BLOCK)
        vol[0, 0, 6:10, 6:10, 100:104] = int(Block.STONE)
        with jax.default_device(jax.devices("cpu")[0]):
            scene = brickmap.build_scene(jnp.asarray(vol), 0, 0)
            H, W = 16, 32
            player = camera.Player(pos=np.array([8.0, 120.0, -10.0], np.float32), phi=-0.5)
            cam = player.camera_params(W, H)
            params = sky_mod.sky_params(1.0, 0.0)
            single = tracer.render_sample(
                scene, cam, params, H, W, jnp.int32(3), tile_rows=2, tile_cols=None,
                compact=True,
            )
        shard = sharding.sharded_render(
            mesh, scene, cam, params, H, W, jnp.int32(3), tile_rows=2, tile_cols=None,
            compact=True,
        )
        for s, g in zip(single, shard):
            s, g = np.asarray(s), np.asarray(g)
            bad = (np.abs(s - g) > 1e-3).reshape(H, W, -1).any(axis=-1)
            assert bad.sum() <= H * W * 0.005, f"{bad.sum()} divergent pixels"


class TestDataParallelGeneration:
    def test_matches_unsharded(self, mesh):
        subset = {Biome.PLAINS: None, Biome.DESERT: None}
        from mega_minecraft_tpu.terrain import heightfield

        subset = {b: heightfield.HEIGHT_FNS[b] for b in subset}
        pos = np.array([[i * 16, 0] for i in range(8)], np.int32)
        sharded = np.asarray(
            sharding.dp_generate(mesh, jnp.asarray(pos), height_fns=subset)
        )
        # unsharded reference: same staged programs on ONE CPU device (the default
        # backend may be a TPU whose transcendentals differ bit-wise from CPU)
        p1 = jax.device_put(jnp.asarray(pos), jax.devices("cpu")[0])
        hf, w, ls = jax.jit(
            lambda p: sharding._gen_stage_layers(p, height_fns=subset)
        )(p1)
        unsharded = np.asarray(jax.jit(sharding._gen_stage_fill)(hf, w, ls, p1))
        np.testing.assert_array_equal(sharded, unsharded)

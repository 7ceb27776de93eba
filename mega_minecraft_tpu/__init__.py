"""mega_minecraft_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of Mega Minecraft.

A real-time path-traced Minecraft-scale voxel world engine with the capabilities of
AdityaGupta1/mega-minecraft, re-designed TPU-first:

- ``ops``      deterministic hash / RNG / noise primitive library (f32-faithful to the
               reference's formulas, reference: src/util/rng.hpp).
- ``world``    block / biome / material / feature data tables
               (reference: src/terrain/{block,biome,biomeFuncs}.hpp).
- ``terrain``  the batched chunk-generation pipeline: heightfield+biomes, layers,
               zone erosion, caves, feature placement, mega fill, decorators, and the
               action-time streaming scheduler (reference: src/terrain/).
- ``render``   brick-map voxel DDA wavefront path tracer, sky, materials, denoise,
               tonemap, meshing (reference: src/rendering/, src/shaders/).
- ``parallel`` device-mesh sharding (shard_map/pjit) of chunk batches and pixel tiles.
- ``app``      engine loop, camera/player, fly-through harness.
"""

__version__ = "0.1.0"

from . import blocks, biomes  # noqa: F401

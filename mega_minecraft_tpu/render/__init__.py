from . import brickmap, camera, materials, sky, tonemap, tracer  # noqa: F401

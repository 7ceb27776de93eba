from . import brickmap, camera, denoise, materials, meshing, sky, tonemap, tracer  # noqa: F401

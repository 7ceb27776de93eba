from . import (  # noqa: F401
    brickmap,
    camera,
    debug_renderer,
    denoise,
    materials,
    meshing,
    sky,
    tonemap,
    tracer,
)

from . import heightfield  # noqa: F401

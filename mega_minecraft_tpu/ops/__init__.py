from . import hashes, noise  # noqa: F401

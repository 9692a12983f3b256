from . import decoders, triplane  # noqa: F401

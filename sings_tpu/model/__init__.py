from . import avatar, density  # noqa: F401

from . import core, defaults  # noqa: F401

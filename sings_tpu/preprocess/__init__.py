from . import frames, refine  # noqa: F401

from . import refine  # noqa: F401

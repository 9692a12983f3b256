from . import anim, cameras, kit  # noqa: F401

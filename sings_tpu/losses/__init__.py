from . import lpips, photometric, regularizers  # noqa: F401

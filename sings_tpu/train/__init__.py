from . import checkpoint, optim, step, trainer  # noqa: F401

from . import amass, body_model, lbs, poses, template  # noqa: F401

from . import camera, rigid, rotations  # noqa: F401

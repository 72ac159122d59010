from . import se3, camera, geometry  # noqa: F401

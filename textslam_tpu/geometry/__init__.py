from . import quaternion, se3, sim3, plane, camera, triangulate  # noqa: F401

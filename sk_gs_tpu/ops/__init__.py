from . import quaternion, se3, sh, transforms, encoders, mlp, knn  # noqa: F401

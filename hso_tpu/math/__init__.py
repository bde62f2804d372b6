from hso_tpu.math import se3, se3np, robust  # noqa: F401

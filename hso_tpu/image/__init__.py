from hso_tpu.image import pyramid, interp  # noqa: F401

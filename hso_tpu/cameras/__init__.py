from hso_tpu.cameras.base import AbstractCamera  # noqa: F401
from hso_tpu.cameras.models import (  # noqa: F401
    PinholeCamera,
    FOVCamera,
    EquidistantCamera,
)

from hso_tpu.photometric.online_calib import (
    OnlinePhotometricCalibrator,
    correct_image,
    inverse_response_curve,
    solve_photometric,
    vignette_map,
)

__all__ = [
    "OnlinePhotometricCalibrator",
    "correct_image",
    "inverse_response_curve",
    "solve_photometric",
    "vignette_map",
]

from audiodenoiser_tpu.eval.metrics import si_sdr
from audiodenoiser_tpu.eval.runner import (
    DenoiserRunner,
    load_model_for_noise,
    test_single_noise_type,
)

__all__ = [
    "si_sdr",
    "DenoiserRunner",
    "load_model_for_noise",
    "test_single_noise_type",
]

from audiodenoiser_tpu.models.unet import UNet, DoubleConv, count_params
from audiodenoiser_tpu.models.complex_mask import (
    ComplexMaskUNet,
    apply_mask,
    denoise_waveform,
    spectrogram_features,
)
from audiodenoiser_tpu.models.int8 import Int8UNet, prepare_int8

__all__ = [
    "UNet",
    "DoubleConv",
    "count_params",
    "ComplexMaskUNet",
    "apply_mask",
    "denoise_waveform",
    "spectrogram_features",
    "Int8UNet",
    "prepare_int8",
]

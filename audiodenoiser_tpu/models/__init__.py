from audiodenoiser_tpu.models.unet import UNet, DoubleConv, count_params
from audiodenoiser_tpu.models.complex_mask import (
    ComplexMaskUNet,
    apply_mask,
    denoise_waveform,
    spectrogram_features,
)
from audiodenoiser_tpu.models.folded import (
    FoldedUNet,
    fold_for_inference,
    fold_runner_inputs,
)
from audiodenoiser_tpu.models.int8 import Int8UNet, prepare_int8
from audiodenoiser_tpu.models.router import NOISE_CLASSES, NoiseClassifier

__all__ = [
    "NOISE_CLASSES",
    "NoiseClassifier",
    "UNet",
    "DoubleConv",
    "count_params",
    "ComplexMaskUNet",
    "apply_mask",
    "denoise_waveform",
    "spectrogram_features",
    "FoldedUNet",
    "fold_for_inference",
    "fold_runner_inputs",
    "Int8UNet",
    "prepare_int8",
]

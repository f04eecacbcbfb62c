from audiodenoiser_tpu.ops.pallas.stft_kernel import stft_pallas
from audiodenoiser_tpu.ops.pallas.istft_kernel import istft_pallas
from audiodenoiser_tpu.ops.pallas.overlap_add_kernel import overlap_add_pallas
from audiodenoiser_tpu.ops.pallas.deconv_kernel import conv_transpose_2x2

__all__ = [
    "stft_pallas",
    "istft_pallas",
    "overlap_add_pallas",
    "conv_transpose_2x2",
]

from audiodenoiser_tpu.dsp import griffin_lim as griffin_lim_mod
from audiodenoiser_tpu.dsp import mel as mel_mod
from audiodenoiser_tpu.dsp import noise
from audiodenoiser_tpu.dsp import stft as stft_mod
from audiodenoiser_tpu.dsp.griffin_lim import griffin_lim
from audiodenoiser_tpu.dsp.mel import mel_filterbank, mel_spectrogram
from audiodenoiser_tpu.dsp.stft import (
    frame_signal,
    istft,
    magnitude,
    magphase,
    num_frames,
    overlap_add,
)
from audiodenoiser_tpu.dsp.window import hann_window

# NOTE: the batched STFT itself is `audiodenoiser_tpu.dsp.stft_mod.stft` —
# re-exporting it here would shadow the `stft` submodule name.
compute_stft = stft_mod.stft

__all__ = [
    "compute_stft",
    "frame_signal",
    "griffin_lim",
    "hann_window",
    "istft",
    "magnitude",
    "magphase",
    "mel_filterbank",
    "mel_spectrogram",
    "noise",
    "num_frames",
    "overlap_add",
    "stft_mod",
    "griffin_lim_mod",
    "mel_mod",
]

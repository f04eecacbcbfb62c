from audiodenoiser_tpu.data.wav_io import read_wav, write_wav, load_wav_list
from audiodenoiser_tpu.data.chunking import (
    frame_audio,
    match_audio_length,
    pad_or_truncate,
)
from audiodenoiser_tpu.data.dataset import SpectrogramPairs, split_train_val, batches
from audiodenoiser_tpu.data.pipeline import OnDeviceMixer, NoiseBank

__all__ = [
    "read_wav",
    "write_wav",
    "load_wav_list",
    "frame_audio",
    "match_audio_length",
    "pad_or_truncate",
    "SpectrogramPairs",
    "split_train_val",
    "batches",
    "OnDeviceMixer",
    "NoiseBank",
]

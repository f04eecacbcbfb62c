"""audiodenoiser_tpu — a TPU-native audio-denoising framework (JAX/Flax/XLA/Pallas).

Re-implements, TPU-first, the full capabilities of the reference
``jimonld2000/AudioDenoiser`` project (see ``/root/reference``): four synthetic
noise corruptions over clean 8 kHz audio, a ~31 M-parameter spectrogram U-Net
trained per noise type with a combined multi-scale-STFT + mel + L1 loss, and
waveform reconstruction via iterative phase recovery — redesigned around XLA
compilation, device meshes, and Pallas kernels rather than the reference's
offline CPU featurization + single-GPU PyTorch loop.

Subpackages
-----------
dsp       batched STFT/iSTFT, Griffin-Lim, mel filterbanks, noise synthesis
ops       Pallas TPU kernels for the framing/window/overlap-add hot paths
models    Flax model zoo (spectrogram U-Net)
losses    jittable spectral losses (multi-scale STFT, mel, combined)
data      wav IO, chunking, npy datasets, host+device input pipelines
train     jitted training loop, checkpointing, metrics/logging
parallel  device-mesh construction and sharding rules (dp + channel tp)
eval      fused inference graph, metrics (SI-SDR), artifact writers
cli       flag-compatible entry points (create_*_dataset, train, test)
"""

__version__ = "0.1.0"

SAMPLE_RATE = 8000
N_FFT = 512
HOP_LENGTH = 128
CHUNK_SECONDS = 2.0
CHUNK_SAMPLES = int(SAMPLE_RATE * CHUNK_SECONDS)
SNR_DB = 8.0
NOISE_TYPES = ("white", "urban", "reverb", "noise_cancellation")
TARGET_SIZE = (256, 64)

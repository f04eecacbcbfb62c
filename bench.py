"""Headline benchmark: end-to-end STFT -> U-Net denoise -> iSTFT throughput.

Driver contract: prints ONE JSON line {"metric","value","unit",
"vs_baseline"}. Implementation lives in audiodenoiser_tpu.eval.bench so
both this repo-root script and the packaged `adt-bench` console entry
share it.
"""

from audiodenoiser_tpu.eval.bench import main, run_bench  # noqa: F401

if __name__ == "__main__":
    main()

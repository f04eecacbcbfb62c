"""Console entry point for the headline benchmark (packaged)."""

from audiodenoiser_tpu.eval.bench import main

if __name__ == "__main__":
    main()

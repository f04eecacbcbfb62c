from audiodenoiser_tpu.models.unet import UNet, DoubleConv, count_params

__all__ = ["UNet", "DoubleConv", "count_params"]

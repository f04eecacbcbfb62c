from audiodenoiser_tpu.utils.profiling import maybe_trace, timed
from audiodenoiser_tpu.utils.debug import assert_tree_finite

__all__ = ["maybe_trace", "timed", "assert_tree_finite"]

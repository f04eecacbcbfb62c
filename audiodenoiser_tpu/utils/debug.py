"""Numerical guards (SURVEY.md §5 race/sanitizer plan: jit purity + NaN checks)."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def assert_tree_finite(tree: Any, name: str = "tree") -> None:
    """Host-side finiteness check over a pytree (use at epoch boundaries;
    inside jit prefer ``jax.debug.check`` / checkify)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")

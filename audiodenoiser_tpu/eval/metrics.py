"""Audio quality metrics (jittable)."""

from __future__ import annotations

import jax.numpy as jnp


def si_sdr(estimate: jnp.ndarray, reference: jnp.ndarray, eps: float = 1e-8):
    """Scale-invariant SDR in dB over the last axis (batched).

    The BASELINE.md quality criterion ("SI-SDR within 0.1 dB of the PyTorch
    reference") is measured with this. Standard definition: project the
    estimate onto the reference, compare target energy to residual energy.
    """
    ref_energy = jnp.sum(reference**2, axis=-1, keepdims=True)
    alpha = jnp.sum(estimate * reference, axis=-1, keepdims=True) / (ref_energy + eps)
    target = alpha * reference
    noise = estimate - target
    ratio = jnp.sum(target**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)

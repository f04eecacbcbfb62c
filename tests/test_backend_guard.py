"""Relay-liveness guard: CLIs fail fast instead of hanging on a dead
backend (utils/backend.require_device)."""

import time

import jax
import pytest

from audiodenoiser_tpu.utils.backend import require_device


def test_require_device_passes_on_live_backend():
    require_device(timeout_s=30.0, who="test")  # CPU backend: instant


def test_require_device_times_out_on_hang(monkeypatch):
    monkeypatch.setattr(jax, "devices", lambda *a, **k: time.sleep(60))
    with pytest.raises(SystemExit, match="did not initialize"):
        require_device(timeout_s=0.2, who="test")


def test_require_device_surfaces_init_error(monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("relay socket refused")

    monkeypatch.setattr(jax, "devices", boom)
    with pytest.raises(SystemExit, match="relay socket refused"):
        require_device(timeout_s=5.0, who="test")

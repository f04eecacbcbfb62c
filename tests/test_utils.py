"""Utility coverage: profiling helpers, scalar writer, debug guards, install errors."""

import csv
import logging
import os

import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.train.logging_utils import ScalarWriter, setup_logger
from audiodenoiser_tpu.utils import assert_tree_finite, maybe_trace, timed


class TestProfiling:
    def test_timed_returns_mean(self):
        out = timed(lambda: jnp.ones(8) * 2, warmup=1, iters=3)
        assert out["iters"] == 3 and out["mean_s"] > 0

    def test_maybe_trace_noop_without_dir(self):
        with maybe_trace(None):
            x = jnp.sum(jnp.ones(4))
        assert float(x) == 4.0

    def test_maybe_trace_writes_profile(self, tmp_path):
        d = str(tmp_path / "trace")
        with maybe_trace(d):
            jnp.sum(jnp.ones(64)).block_until_ready()
        files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
        assert files  # xplane/trace artifacts exist


class TestDebugGuards:
    def test_assert_tree_finite_passes(self):
        assert_tree_finite({"a": np.ones(3), "b": {"c": np.zeros(2)}})

    def test_assert_tree_finite_raises_with_path(self):
        with pytest.raises(FloatingPointError, match="b"):
            assert_tree_finite({"a": np.ones(3), "b": np.array([np.nan])})

    def test_ignores_integer_leaves(self):
        assert_tree_finite({"steps": np.array([1, 2, 3])})


class TestScalarWriter:
    def test_csv_fallback_rows(self, tmp_path, monkeypatch):
        import builtins

        real_import = builtins.__import__

        def no_torch(name, *a, **k):
            if name.startswith("torch"):
                raise ImportError(name)
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_torch)
        w = ScalarWriter(str(tmp_path))
        w.add_scalar("Loss/train", 1.5, 0)
        w.add_scalar("Loss/validation", 2.5, 0)
        w.close()
        rows = list(csv.reader(open(tmp_path / "scalars.csv")))
        assert ["Loss/train", "0", "1.5"] in rows
        assert ["Loss/validation", "0", "2.5"] in rows

    def test_reference_logger_format(self, tmp_path, capsys):
        log_path = str(tmp_path / "run" / "training.log")
        logger = setup_logger(log_path, name="fmt_test_logger")
        logger.info("hello world")
        for h in logger.handlers:
            h.flush()
        content = open(log_path).read()
        # file format: asctime - levelname - message (train.py:30)
        assert " - INFO - hello world" in content


class TestInstallErrors:
    def test_bad_archive_raises(self, tmp_path):
        from audiodenoiser_tpu.cli.install import provision

        bad = tmp_path / "x.zip"
        bad.write_bytes(b"not a zip")
        with pytest.raises(Exception):
            provision(str(bad), str(tmp_path / "d"))


class TestPersistentCache:
    def test_enable_sets_cache_dir(self, tmp_path, monkeypatch):
        import jax

        from audiodenoiser_tpu.utils.cache import enable_persistent_cache

        from audiodenoiser_tpu.utils.cache import host_cpu_cache_key

        monkeypatch.delenv("ADT_NO_COMPILE_CACHE", raising=False)
        prev = jax.config.jax_compilation_cache_dir
        try:
            path = enable_persistent_cache(str(tmp_path / "xla"))
            # on CPU backends the cache dir is keyed by the host's CPU
            # feature set (XLA:CPU serializes host machine code whose cache
            # key ignores ISA features — see utils/cache.host_cpu_cache_key)
            assert path == os.path.join(str(tmp_path / "xla"),
                                        host_cpu_cache_key())
            assert os.path.isdir(path)
            assert jax.config.jax_compilation_cache_dir == path
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    def test_opt_out_env(self, monkeypatch):
        from audiodenoiser_tpu.utils.cache import enable_persistent_cache

        monkeypatch.setenv("ADT_NO_COMPILE_CACHE", "1")
        assert enable_persistent_cache() is None

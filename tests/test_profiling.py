"""Profiling / sanitizer utilities (utils/profiling.py — SURVEY §5 aux)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hl_hgat_tpu.utils import profiling


class TestProfiling:
    def test_step_timer_counts(self):
        t = profiling.StepTimer(edges_per_step=100)
        for _ in range(3):
            with t:
                pass
        assert t.summary()["steps"] == 3
        assert t.edges_per_sec > 0

    def test_device_barrier_forces_completion(self):
        x = jnp.ones((8, 8))
        y = jax.jit(lambda a: a @ a)(x)
        profiling.device_barrier(y)  # must not raise; readback-gated
        assert np.asarray(y)[0, 0] == 8

    def test_nan_checks_toggle(self):
        profiling.enable_nan_checks(True)
        with pytest.raises(FloatingPointError):
            jnp.asarray(
                jax.jit(lambda a: a / a)(jnp.zeros(2))
            ).block_until_ready()
            # CPU backend raises on the NaN product under jax_debug_nans
        profiling.enable_nan_checks(False)
        out = jax.jit(lambda a: a / a)(jnp.zeros(2))
        assert np.isnan(np.asarray(out)).all()


class TestXplaneTooling:
    def test_trace_roundtrip_parses(self, tmp_path):
        """jax.profiler trace -> benchmarks/xplane parser (protoc-compiled
        schema; the env ships no TF profiler protos).  Guards the committed
        xplane_pb2 against schema drift."""
        import os
        import sys

        logdir = str(tmp_path / "trace")
        f = jax.jit(lambda a: (a @ a).sum())
        x = jnp.ones((64, 64))
        float(f(x))
        jax.profiler.start_trace(logdir)
        float(f(x))
        jax.profiler.stop_trace()

        root = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                            "xplane")
        sys.path.insert(0, root)
        try:
            from parse_trace import load_spaces
        finally:
            sys.path.remove(root)
        spaces = list(load_spaces(logdir))
        assert spaces, "no xplane.pb produced"
        _, space = spaces[0]
        names = [p.name for p in space.planes]
        assert any("CPU" in n or "TPU" in n for n in names), names
        # events decode with real durations
        cpu = [p for p in space.planes if "CPU" in p.name][0]
        n_events = sum(len(l.events) for l in cpu.lines)
        assert n_events > 0

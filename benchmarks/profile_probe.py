"""One-shot jax.profiler trace of the flagship step on the tunneled TPU.

Writes a trace to /tmp/hlhgat_trace; if device events arrive through the
tunnel, the xplane protos give the op-level time breakdown.  Falls back
gracefully if the backend doesn't support remote tracing.

    python benchmarks/profile_probe.py
"""

from __future__ import annotations

import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    from hl_hgat_tpu.models import presets
    from hl_hgat_tpu.train import Trainer, TrainerConfig

    cache = "/tmp/hlhgat_bench_packed_256.pkl"
    with open(cache, "rb") as fh:
        batch = pickle.load(fh)
    batch = jax.tree.map(jnp.asarray, batch)
    model, _ = presets.zinc_pyr(compute_dtype="bfloat16", remat=False)
    tr = Trainer(model, TrainerConfig(task="regression"))
    state = tr.init_state(batch)

    @jax.jit
    def multi(state, batch):
        def body(s, _):
            s, loss = tr._train_step_impl(s, batch)
            return s, loss

        return jax.lax.scan(body, state, None, length=50)

    state, losses = multi(state, batch)
    np.asarray(losses)  # warm

    logdir = "/tmp/hlhgat_trace"
    try:
        jax.profiler.start_trace(logdir)
        state, losses = multi(state, batch)
        np.asarray(losses)
        jax.profiler.stop_trace()
    except Exception as e:
        print("tracing failed:", e)
        return
    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    print("trace files:", files)
    for f in files:
        print(f, os.path.getsize(f), "bytes")


if __name__ == "__main__":
    main()

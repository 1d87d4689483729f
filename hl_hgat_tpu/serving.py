"""Batch inference / serving on trained models.

The reference has no inference entry point beyond its test() loops (e.g.
reference main_zinc...py:165-180); production use needs one: load a trained
checkpoint, compile the forward once per static batch shape, and stream
samples through with padding stripped and input order preserved.

    predictor = Predictor.from_checkpoint(model, ckpt_dir, samples[:1])
    preds = predictor(samples)            # graph task: [N, ...] array
    edge_preds = predictor(samples)       # edge task: list of [e_i] arrays

Uses the packed MXU layout + derived transfer (the training fast path);
batches are deterministic (no shuffle, no dropout, BN in inference mode),
and short final batches are filler-padded then stripped, so outputs align
1:1 with the input samples.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.complex.build import GraphSample
from hl_hgat_tpu.complex.compact import maybe_inflate
from hl_hgat_tpu.data.loader import BucketedLoader

# Measured single-chip serving knee for ZINC-sized molecular graphs
# (benchmarks/infer_bench.py, round 4: 6.669M edges/s @384 vs 6.448M @320
# on a v5e) — the serving-side analog of training's ``--layout auto``
# recipe.  Callers with enough in-flight requests should batch at this
# size; the default below stays smaller because serving latency at 64
# graphs is ~6× lower while throughput is still within ~2× of the knee.
RECOMMENDED_THROUGHPUT_BATCH = 384


class Predictor:
    """Jitted deterministic forward over padded batches.

    ``edge_level=True`` returns one unpadded array per input graph (TSP-style
    per-edge outputs); otherwise one leading-axis row per graph.

    ``batch_size``: the default 64 favors latency; for offline/throughput
    serving pass ``batch_size=RECOMMENDED_THROUGHPUT_BATCH`` (the measured
    single-chip knee — see benchmarks/RESULTS.md round 4).
    """

    def __init__(
        self,
        model,
        variables,
        *,
        batch_size: int = 64,
        edge_level: bool = False,
        node_cap: int = 128,
        edge_cap: int = 0,
        transfer: str = "derived",
    ):
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.edge_level = edge_level
        self.node_cap = node_cap
        self.edge_cap = edge_cap or node_cap
        self.transfer = transfer

        def forward(variables, batch):
            batch = maybe_inflate(batch)
            out = model.apply(variables, batch, deterministic=True)
            return out[0] if isinstance(out, tuple) else out

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(
        cls, model, ckpt_dir: str, example_samples: Sequence[GraphSample],
        **kw,
    ) -> "Predictor":
        """Initialize variable shapes from example samples, then restore."""
        from hl_hgat_tpu.train.checkpoint import restore_checkpoint
        from hl_hgat_tpu.train.trainer import Trainer, TrainerConfig

        self = cls(model, None, **kw)
        batch = next(iter(self._loader(list(example_samples))))
        # the restore template comes from the same constructor that wrote
        # the checkpoint — structure matches by construction
        template = Trainer(model, TrainerConfig()).init_state(
            jax.tree.map(jnp.asarray, batch)
        )
        restored = restore_checkpoint(ckpt_dir, template)
        self.variables = {
            "params": restored.params, "batch_stats": restored.batch_stats
        }
        return self

    def _loader(self, samples: list[GraphSample]) -> BucketedLoader:
        import dataclasses

        # serving inputs may be unlabeled — the collate wants a y array
        samples = [
            dataclasses.replace(
                s,
                y=np.zeros(
                    s.num_edges if self.edge_level else 1, np.float32
                ),
            )
            if s.y is None
            else s
            for s in samples
        ]
        return BucketedLoader(
            samples,
            batch_size=min(self.batch_size, len(samples)),
            shuffle=False,
            num_buckets=1,
            layout="dense_packed",
            node_cap=self.node_cap,
            edge_cap=self.edge_cap,
            transfer=self.transfer,
            y_per_edge=self.edge_level,
        )

    def __call__(self, samples: Sequence[GraphSample]):
        samples = list(samples)
        loader = self._loader(samples)
        bs = min(self.batch_size, len(samples))
        outs: list[np.ndarray] = []
        produced = 0
        for batch in loader:
            dev = jax.tree.map(jnp.asarray, batch)
            out = np.asarray(self._forward(self.variables, dev))
            keep = min(bs, len(samples) - produced)  # strip filler graphs
            if self.edge_level:
                # row metadata from the HOST batch — compact and dense
                # layouts both carry s_gid (mask derives from it for slim
                # compact batches); no device round-trip
                from hl_hgat_tpu.complex.compact import level_edge_mask

                lvl = batch.levels[0]
                gid = np.asarray(lvl.s_gid).reshape(-1)
                mask = np.asarray(level_edge_mask(lvl)).reshape(-1) > 0
                flat = out.reshape(-1, *out.shape[2:]) if out.ndim > 2 else (
                    out.reshape(-1)
                )
                for g in range(keep):
                    sel = (gid == g) & mask
                    outs.append(flat[sel])
            else:
                outs.extend(out[:keep])
            produced += keep
        if self.edge_level:
            return outs
        return np.stack(outs)


class BrainPredictor:
    """Inference for the shared-skeleton brain family (HLHGATAttpool /
    HLHGCNNAbcd): subjects share one structure, so batches ride the
    shared dense layout (``collate_dense_shared`` — one broadcast operator
    per level, benchmarks/RESULTS.md round 3) and the models' tuple
    outputs (pred, latent, node_att, edge_att) are returned per subject.

    This is the production form of OHBM_DEMO.ipynb cells 47-49: load the
    (imported or trained) checkpoint variables, stream subject time
    series, get predictions and the attention maps the notebook
    visualizes.  Short final batches are filler-padded with the first
    subject and stripped, so outputs align 1:1 with the inputs.
    """

    def __init__(self, model, variables, levels, pools, *,
                 batch_size: int = 16):
        self.model = model
        self.variables = variables
        self.levels = list(levels)
        self.pools = list(pools)
        self.batch_size = batch_size
        st = self.levels[0]
        self.src, self.dst = st.src, st.dst

        def forward(variables, batch):
            return model.apply(variables, batch, deterministic=True)

        self._forward = jax.jit(forward)

    def __call__(self, timeseries: Sequence[np.ndarray]):
        """timeseries: [S, T] per subject (equal T for one compile).

        Returns dict(pred [N], latent [N, D], node_att [N, n0],
        edge_att [N, e0]) in input order.
        """
        from hl_hgat_tpu.complex.dense import collate_dense_shared
        from hl_hgat_tpu.data.datasets import brain_sample

        series = list(timeseries)
        bs = min(self.batch_size, len(series))
        fields = {k: [] for k in ("pred", "latent", "node_att", "edge_att")}
        for lo in range(0, len(series), bs):
            chunk = series[lo:lo + bs]
            keep = len(chunk)
            while len(chunk) < bs:  # filler subjects, stripped below
                chunk.append(chunk[0])
            samples = [
                brain_sample(ts, self.src, self.dst, self.levels,
                             self.pools, y=0.0, y_mean=0.0, y_std=1.0)
                for ts in chunk
            ]
            batch = jax.tree.map(
                jnp.asarray, collate_dense_shared(samples, multiple=1))
            out = self._forward(self.variables, batch)
            if not isinstance(out, tuple):
                # HLHGCNNAbcd returns the bare prediction; HLHGATAttpool
                # returns (pred, latent, node_att, edge_att) — zip fills
                # only the fields the model provides
                out = (out,)
            for k, v in zip(fields, out):
                fields[k].append(np.asarray(v)[:keep])
        return {
            k: np.concatenate(v, axis=0) for k, v in fields.items() if v
        }

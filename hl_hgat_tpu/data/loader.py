"""Bucketed batch loader.

Replaces the PyG ragged ``DataLoader`` + CPU worker pool (reference
main_zinc...py:223-225): samples are grouped into a small set of fixed pad
buckets so the jitted step compiles once per bucket, shuffled per epoch, and
collated host-side (optionally by the C++ collator when built).

Bucketing policy (SURVEY.md §7 hard-part 2): pick bucket boundaries from the
size distribution's quantiles, pad each batch to its bucket's precomputed
maxima.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import numpy as np

from hl_hgat_tpu.complex.batch import ComplexBatch
from hl_hgat_tpu.complex.build import GraphSample, LevelPad, collate


def _sample_cost(s: GraphSample) -> int:
    return s.num_nodes + s.num_edges


@dataclasses.dataclass
class BucketedLoader:
    """``layout``:

    * ``"coo"`` — flat `ComplexBatch` (general path);
    * ``"dense_packed"`` — superblock `DenseBatch` (MXU fast path,
      complex/dense.py): ~4-5 small graphs per 128-row tile, block count
      padded to a per-bucket static cap so the jitted step compiles once per
      bucket.  MLGC pyramids pack too — coarse levels reuse the level-0
      graph→bin assignment, capped by the level-0 caps (coarse complexes
      are strictly smaller).
    """

    samples: Sequence[GraphSample]
    batch_size: int
    shuffle: bool = True
    num_buckets: int = 1
    y_per_edge: bool = False
    # per-node labels (PascalVOC-SP / COCO-SP node classification); COO
    # layout only — the packed collators do not carry node-level labels
    y_per_node: bool = False
    pad_multiple: int = 8
    pad_slack: float = 1.0
    seed: int = 0
    layout: str = "coo"
    node_cap: int = 128
    edge_cap: int = 128
    # dense_packed only: "dense" ships ready dense blocks; "compact" ships
    # COO operator triplets that densify ON DEVICE at step entry
    # (complex/compact.py inflate; Trainer handles it automatically) —
    # ~5-15x fewer host->device bytes per batch.  "derived" additionally
    # drops the L0/L1 triplets and the degree vector: only B1 + per-graph
    # 2/λmax cross the link and two batched matmuls rebuild the Laplacians
    # on device (≤1 ulp; another ~40% fewer bytes).
    transfer: str = "dense"
    # compact/derived only: ship just the real feature rows + their flat
    # destinations (drop the pad rows — ~20-25% of feature bytes), masks
    # derived on device, int16 id columns.  All exact; see
    # complex/compact.py.  Set False to ship the dense feature blocks.
    pack_feature_rows: bool = True
    # Feature transfer dtype.  With a bfloat16 compute_dtype model the
    # features are cast at model entry anyway (models/backbone.py), so
    # shipping them pre-cast halves the x_t/x_s bytes on the link with
    # BIT-IDENTICAL results (host ml_dtypes and the device cast both round
    # to nearest even).  Keep float32 when the model computes in float32.
    feature_dtype: str = "float32"
    # Link-prediction query attachment (PCQM-Contact, COO layout only):
    # (n_queries, n_neg) per graph — each batch gains batch-carried
    # ``pairs``/``pair_mask`` and per-pair ``y`` labels re-rolled each
    # epoch (complex/build.py attach_link_pairs).  Static shapes: every
    # batch yields G·n_queries·(1+n_neg) pair rows.
    link_queries: tuple[int, int] | None = None
    # fill short final batches with the bucket's smallest sample to keep
    # num_graphs static (one jit shape; duplicates bias only the final
    # partial batch).  Set False for EXACT evaluation metrics — the final
    # batch then carries fewer graphs (one extra compile for its shape).
    pad_final: bool = True
    # Per-epoch structure augmentation via precomputed variants: ``samples``
    # holds ``variants`` consecutive augmentation rolls per underlying graph
    # (layout [g0v0, g0v1, ..., g1v0, ...] — data/ingest.py aug_variants);
    # epoch e serves variant (e + i) % variants of graph i, so every epoch
    # sees a fresh aug roll per graph like the reference's load-time
    # dropout_node/dropout_edge (reference lib/Hodge_Dataset.py:695-707,
    # :769-804) while pads/buckets stay static (computed over ALL variants).
    variants: int = 1

    def __post_init__(self):
        if self.layout not in ("coo", "dense_packed"):
            raise ValueError(f"unknown layout {self.layout!r}")
        if self.y_per_node and self.layout != "coo":
            raise ValueError("y_per_node labels need layout='coo'")
        if self.transfer not in ("dense", "compact", "derived"):
            raise ValueError(f"unknown transfer {self.transfer!r}")
        if self.variants > 1 and len(self.samples) % self.variants:
            raise ValueError(
                f"{len(self.samples)} samples not divisible by "
                f"variants={self.variants}"
            )
        costs = np.asarray([_sample_cost(s) for s in self.samples])
        if self.variants > 1:
            # bucket by GROUP (worst variant) so every roll of one graph
            # lands in the same bucket — static shapes across epochs
            costs = np.repeat(
                costs.reshape(-1, self.variants).max(axis=1), self.variants
            )
        if self.num_buckets > 1:
            qs = np.quantile(
                costs, np.linspace(0, 1, self.num_buckets + 1)[1:-1]
            )
            self._bucket_of = np.searchsorted(qs, costs)
        else:
            self._bucket_of = np.zeros(len(self.samples), np.int64)
        # per-bucket pad spec = maxima over the worst-case batch of that
        # bucket (top batch_size samples by each resource)
        self._pads: list[list[LevelPad]] = []
        depth = len(self.samples[0].levels)
        for b in range(self.num_buckets):
            idx = np.nonzero(self._bucket_of == b)[0]
            members = [self.samples[i] for i in idx] or list(self.samples)
            pads = []
            for lv in range(depth):
                def worst(key):
                    vals = sorted((key(s.levels[lv]) for s in members),
                                  reverse=True)
                    total = sum(vals[: self.batch_size])
                    # buckets smaller than batch_size get filled with their
                    # smallest member — account for those copies
                    if len(vals) < self.batch_size:
                        total += (self.batch_size - len(vals)) * vals[-1]
                    return int(total * self.pad_slack)

                rnd = lambda x: max(  # noqa: E731
                    -(-x // self.pad_multiple) * self.pad_multiple,
                    self.pad_multiple,
                )
                pads.append(
                    LevelPad(
                        nodes=rnd(worst(lambda l: l.num_nodes)),
                        edges=rnd(worst(lambda l: l.num_edges)),
                        nnz0=rnd(worst(lambda l: l.l0_rows.size)),
                        nnz1=rnd(worst(lambda l: l.l1_rows.size)),
                    )
                )
            self._pads.append(pads)
        # per-bucket smallest member: safe filler for short final batches
        # (chunk-sum + (B−k)·min ≤ top-B sum, so pad specs always hold)
        self._filler: list[GraphSample] = []
        self._filler_idx: list[int] = []
        for b in range(self.num_buckets):
            idx = np.nonzero(self._bucket_of == b)[0]
            cand = idx if idx.size else np.arange(len(self.samples))
            best = int(
                min(cand, key=lambda i: _sample_cost(self.samples[i]))
            )
            self._filler.append(self.samples[best])
            self._filler_idx.append(best)
        # packed layout: static per-bucket block cap — the packer is
        # first-fit-decreasing (complex/dense.py::pack_plan and the C++
        # pack_indices agree assignment-for-assignment), and any "any-fit"
        # packer leaves at most ONE bin ≤ half full per resource (a new bin
        # opens only when the item fits no open bin), so
        # 2·(worst totals / cap) + 1 still bounds the block count; a batch
        # exceeding its static pad raises a loud ValueError at iter time.
        if self.layout == "dense_packed":
            # Emitted block count: on the plain packed path the actual FFD
            # result is rounded up to a multiple of 16 per batch (absorbs
            # shuffle variance → one or two jit shapes per bucket).  The
            # compact/derived transfer path instead uses PINNED per-bucket
            # caps from _compact_caps (+4 margin rounded to 4, ratcheting
            # on the rare exceed) — exactly ONE jit signature per bucket.
            self._block_multiple = 16
            # flatten once for the native per-epoch collate
            # (data/fast_collate.py; transparently falls back to the NumPy
            # path when the C++ library is unavailable)
            from hl_hgat_tpu.data.fast_collate import FlatSamples

            self._flat = FlatSamples(list(self.samples))
            # Per-bucket PINNED caps for the compact/derived transfer.
            # Without pins the per-batch rounding (nnz to 2048, blocks to
            # 16) flips jit shapes whenever a shuffle straddles a quantum
            # boundary — measured 14-40 s "epochs" of recompiles through
            # the tunnel vs 0.23-0.31 s pinned.  Pins are seeded from the
            # first batch of each bucket with a ~6% + one-quantum margin
            # (batch sums concentrate to ±2-3% across shuffles) and
            # RATCHET up on the rare exceed (one recompile, then stable).
            self._compact_pins: dict[int, dict] = {}
            if self.transfer in ("compact", "derived"):
                # per-sample valid pool-entry counts (cn/ce >= 0)
                self._pool_valid = []
                def _seg_counts(flags, off):
                    c = np.concatenate(
                        [[0], np.cumsum(flags.astype(np.int64))]
                    )
                    return c[off[1:]] - c[off[:-1]]

                for lv in range(self._flat.depth - 1):
                    self._pool_valid.append((
                        _seg_counts(self._flat.c_node[lv] >= 0,
                                    self._flat.cn_off[lv]),
                        _seg_counts(self._flat.c_edge[lv] >= 0,
                                    self._flat.ce_off[lv]),
                    ))
        self._epoch = 0

    def _compact_caps(self, bucket: int, idx: np.ndarray, n_bins: int):
        """Pinned (num_blocks, nnz_caps, pool_caps) for one batch."""
        rnd = lambda x, m: max(-(-int(x) // m) * m, m)  # noqa: E731
        need = {"blocks": n_bins, "nnz": [], "pool": []}
        for lv in range(self._flat.depth):
            fl = self._flat.levels[lv]
            need["nnz"].append((
                int((fl.l0_off[idx + 1] - fl.l0_off[idx]).sum()),
                int((fl.l1_off[idx + 1] - fl.l1_off[idx]).sum()),
                int((fl.e_off[idx + 1] - fl.e_off[idx]).sum()),
            ))
        for t, s in self._pool_valid:
            need["pool"].append(max(int(t[idx].sum()), int(s[idx].sum())))
        pins = self._compact_pins.get(bucket)
        margin = lambda x, m: rnd(x + max(x // 16, m // 2), m)  # noqa: E731
        if pins is None:
            pins = {
                "blocks": rnd(need["blocks"] + 4, 4),
                "nnz": [tuple(margin(x, 2048) for x in tri)
                        for tri in need["nnz"]],
                "pool": [margin(x, 2048) for x in need["pool"]],
            }
            self._compact_pins[bucket] = pins
        else:  # ratchet any exceeded field
            if need["blocks"] > pins["blocks"]:
                pins["blocks"] = rnd(need["blocks"] + 4, 4)
            pins["nnz"] = [
                tuple(margin(x, 2048) if x > c else c
                      for x, c in zip(tri, cur))
                for tri, cur in zip(need["nnz"], pins["nnz"])
            ]
            pins["pool"] = [
                margin(x, 2048) if x > c else c
                for x, c in zip(need["pool"], pins["pool"])
            ]
        return pins["blocks"], pins["nnz"], pins["pool"]

    @property
    def pad_specs(self) -> list[list[LevelPad]]:
        return self._pads

    def __len__(self) -> int:
        return -(-(len(self.samples) // self.variants) // self.batch_size)

    def __iter__(self) -> Iterator[ComplexBatch]:
        ep = self._epoch
        rng = np.random.default_rng(self.seed + ep)
        self._epoch += 1
        if self.variants > 1:
            groups = np.arange(len(self.samples) // self.variants)
            if self.shuffle:
                rng.shuffle(groups)
            # fresh aug roll per graph per epoch, decorrelated across graphs
            order = groups * self.variants + (ep + groups) % self.variants
        else:
            order = np.arange(len(self.samples))
            if self.shuffle:
                rng.shuffle(order)
        # group by bucket, emit fixed-size batches per bucket
        for b in range(self.num_buckets):
            members = order[self._bucket_of[order] == b]
            for i in range(0, len(members), self.batch_size):
                chunk = members[i : i + self.batch_size]
                if len(chunk) == 0:
                    continue
                # keep num_graphs static: fill short final batches with the
                # bucket's smallest sample (duplicates only bias the final
                # partial batch; pad_final=False for exact evaluation)
                n_fill = (
                    self.batch_size - len(chunk) if self.pad_final else 0
                )
                if self.layout == "dense_packed":
                    from hl_hgat_tpu.data.fast_collate import (
                        collate_packed_compact,
                        collate_packed_fast,
                        pack_indices,
                    )

                    idx = np.concatenate(
                        [chunk, np.full(n_fill, self._filler_idx[b])]
                    ).astype(np.int64)
                    bins = pack_indices(
                        self._flat, idx, self.node_cap, self.edge_cap
                    )
                    m = self._block_multiple
                    depth = len(self.samples[0].levels)
                    kw = {}
                    num_blocks = -(-len(bins) // m) * m
                    if self.transfer in ("compact", "derived"):
                        fn = collate_packed_compact
                        kw["pack_rows"] = self.pack_feature_rows
                        # pinned static caps (see __post_init__): one jit
                        # shape per bucket instead of per-quantum flips
                        num_blocks, kw["nnz_caps"], kw["pool_caps"] = (
                            self._compact_caps(b, idx, len(bins))
                        )
                        if self.pack_feature_rows:
                            # static per-bucket row caps: per-batch rounding
                            # would flip shapes across shuffles and recompile
                            # the step (pads[0] is the bucket's worst-case
                            # top-batch_size row totals)
                            r = lambda x: -(-x // 256) * 256  # noqa: E731
                            kw["row_caps"] = (
                                r(self._pads[b][0].nodes),
                                r(self._pads[b][0].edges),
                            )
                        if self.transfer == "derived":
                            kw["operators"] = "derived"
                    else:
                        fn = collate_packed_fast
                    yield self._cast_features(fn(
                        self._flat,
                        idx,
                        node_cap=self.node_cap,
                        edge_cap=self.edge_cap,
                        y_per_edge=self.y_per_edge,
                        bins=bins,
                        num_blocks=num_blocks,
                        # coarse levels are strictly smaller than the fine
                        # level, so the level-0 caps are a safe static bound
                        level_caps=[(self.node_cap, self.edge_cap)]
                        * (depth - 1),
                        **kw,
                    ))
                else:
                    batch_samples = [self.samples[j] for j in chunk] + [
                        self._filler[b]
                    ] * n_fill
                    batch = self._cast_features(collate(
                        batch_samples, self._pads[b],
                        y_per_edge=self.y_per_edge,
                        y_per_node=self.y_per_node,
                    ))
                    if self.link_queries is not None:
                        from hl_hgat_tpu.complex.build import (
                            attach_link_pairs,
                        )

                        nq, nneg = self.link_queries
                        batch = attach_link_pairs(
                            batch, batch_samples,
                            np.random.default_rng(
                                self.seed * 100003 + ep * 131 + i
                            ),
                            n_queries=nq, n_neg=nneg,
                        )
                    yield batch

    def _cast_features(self, batch):
        if self.feature_dtype == "float32":
            return batch
        import dataclasses

        import ml_dtypes

        dt = np.dtype(getattr(ml_dtypes, self.feature_dtype, None)
                      or self.feature_dtype)
        return dataclasses.replace(
            batch,
            x_t=np.asarray(batch.x_t).astype(dt),
            x_s=np.asarray(batch.x_s).astype(dt),
        )

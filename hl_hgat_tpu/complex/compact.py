"""Compact transfer format for packed dense batches + device-side inflate.

The packed `DenseBatch` (complex/dense.py) materializes every operator as
dense [B, S, S] float32 blocks — ~95% of the batch's bytes, of which ~99%
are zeros (a ZINC-sized graph has ~73 L0 entries in a 16384-slot tile).
Shipping those zeros host→device every step wastes interconnect bandwidth
(PCIe on a real host; the tunnel here), so the loader can instead emit a
`CompactBatch`: features/masks/ids stay dense (they are small and dense by
nature), the operators travel as static-shape COO triplets, and a jitted
`inflate` scatters them into the dense blocks ON DEVICE at step entry
(Trainer does this automatically).  The scatter is a trivially parallel
one-pass write into HBM — microseconds next to the step.

The reference has no analog (cuSPARSE tensors move pre-built, reference
lib/Hodge_Dataset.py:467-470); this is a TPU-native transfer optimization.
Equality with the direct dense collate is asserted in tests/test_data.py.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from hl_hgat_tpu.complex.batch import _pytree_dataclass
from hl_hgat_tpu.complex.dense import DenseBatch, DenseLevel, DensePool

Array = Any


@_pytree_dataclass(meta=("num_graphs", "s_pad", "e_pad"))
class CompactLevel:
    """One level: dense row metadata + COO operators (block-local indices).

    Padding entries carry block id ``>= num_blocks`` — `inflate` drops them
    via out-of-bounds scatter (mode='drop'), the same dump-bucket idiom the
    models use for segment ids.

    **Derived mode** (``operators='derived'``): the L0/L1 triplets and the
    degree vector are ``None`` and only B1 + per-graph spectral scales cross
    the link; `inflate` reconstructs L0 = (B1·B1ᵀ)·(2/λmax) and
    L1 = (B1ᵀ·B1)·(2/λmax) with two batched matmuls on device (the products
    are small exact integers, so the only rounding is the final per-entry
    ×scale — ≤1 ulp vs the host-built values, which multiply in float64
    first; complex/build.py hodge_laplacians_coo).  ~40% fewer bytes per
    batch on ZINC-shaped molecules.
    """

    # COO of the block-diagonal L0 [nnz0_cap]: block, row, col, value
    # (None in derived mode)
    l0_b: Array | None
    l0_r: Array | None
    l0_c: Array | None
    l0_v: Array | None
    # COO of L1 [nnz1_cap] (None in derived mode)
    l1_b: Array | None
    l1_r: Array | None
    l1_c: Array | None
    l1_v: Array | None
    # boundary pairs [e_cap]: block, src row, dst row, edge col
    e_b: Array
    e_src: Array
    e_dst: Array
    e_col: Array
    # dense row metadata (small): [B, S]/[B, E].  ``None`` in slim mode —
    # `inflate` (and `level_node_mask`/`level_edge_mask` for host readers)
    # derives the masks from the gid fields: a row is real iff its gid is a
    # real graph id (< num_graphs; padding rows carry the dump id).
    node_mask: Array | None
    edge_mask: Array | None
    deg: Array | None  # None in derived mode (|B1| row-sum on device)
    # graph ids per row; slim mode ships these (and the COO index columns)
    # as int16 when the ranges fit — `inflate` widens to int32 on device
    n_gid: Array
    s_gid: Array
    # per-graph 2/λmax, indexed by gid with a trailing 0 for the padding
    # bucket: [num_graphs + 1] f32 (None outside derived mode)
    g_scale: Array | None
    num_graphs: int
    s_pad: int
    e_pad: int

    @property
    def num_blocks(self) -> int:
        return self.n_gid.shape[0]


@_pytree_dataclass(meta=("sc", "sf", "ec", "ef"))
class CompactPool:
    """Fine→coarse assignment triplets [cap]: block, coarse row, fine col.

    Row-normalization to means happens on device in `inflate` (matches the
    NumPy path's ``/ max(rowsum, 1)``)."""

    t_b: Array
    t_r: Array
    t_c: Array
    s_b: Array
    s_r: Array
    s_c: Array
    sc: int
    sf: int
    ec: int
    ef: int


@_pytree_dataclass(meta=("num_graphs", "y_packed"))
class CompactBatch:
    """``x_t_rows``/``x_s_rows`` mark **row-packed features**: ``x_t`` is
    then ``[row_cap, F]`` holding only real (unpadded) rows and the index
    arrays give each row's flat destination in the dense ``[B·S, F]``
    layout (padding index entries point past the end and are dropped by
    the device scatter).  Cuts the ~20-25% of feature bytes the packed
    layout's pad rows would otherwise ship.  ``y`` is packed the same way
    (with ``x_s_rows``) when it is edge-level, i.e. whenever it has one
    leading row per level-0 edge slot (``y_packed``)."""

    x_t: Array
    x_s: Array
    y: Array
    levels: tuple[CompactLevel, ...]
    pools: tuple[CompactPool, ...]
    num_graphs: int
    x_t_rows: Array | None = None
    x_s_rows: Array | None = None
    y_packed: bool = False

    @property
    def level0(self) -> CompactLevel:
        return self.levels[0]


def level_node_mask(lv) -> Array:
    """[B, S] f32 validity mask — stored, or derived from gids (slim)."""
    if lv.node_mask is not None:
        return lv.node_mask
    return (lv.n_gid < lv.num_graphs).astype("float32")


def level_edge_mask(lv) -> Array:
    if lv.edge_mask is not None:
        return lv.edge_mask
    return (lv.s_gid < lv.num_graphs).astype("float32")


def _i32(a):
    """Widen slim (int16) transfer indices for the device scatters."""
    return a if a.dtype == jnp.int32 else a.astype(jnp.int32)


def _scatter3(nb: int, rows: int, cols: int, b, r, c, v):
    """Dense [nb, rows, cols] from COO; out-of-range b drops the entry."""
    out = jnp.zeros((nb, rows, cols), jnp.float32)
    return out.at[_i32(b), _i32(r), _i32(c)].set(v, mode="drop")


def _scatter_rows(packed: Array, rows: Array, nb: int, pad: int) -> Array:
    """Row-packed features → dense [nb, pad, *]; pad rows stay zero."""
    flat = jnp.zeros((nb * pad,) + packed.shape[1:], packed.dtype)
    return flat.at[_i32(rows)].set(packed, mode="drop").reshape(
        (nb, pad) + packed.shape[1:]
    )


def inflate(batch: CompactBatch) -> DenseBatch:
    """Device-side densification (jit-traceable): CompactBatch → DenseBatch."""
    x_t, x_s, y = batch.x_t, batch.x_s, batch.y
    if batch.x_t_rows is not None:
        lv0 = batch.levels[0]
        nb0 = lv0.num_blocks
        x_t = _scatter_rows(x_t, batch.x_t_rows, nb0, lv0.s_pad)
        if batch.y_packed:  # edge-level labels pack with the edge rows
            y = _scatter_rows(y, batch.x_s_rows, nb0, lv0.e_pad)
        x_s = _scatter_rows(x_s, batch.x_s_rows, nb0, lv0.e_pad)
    levels = []
    for lv in batch.levels:
        nb = lv.num_blocks
        ng = lv.num_graphs
        n_gid, s_gid = _i32(lv.n_gid), _i32(lv.s_gid)
        node_mask = (lv.node_mask if lv.node_mask is not None
                     else (n_gid < ng).astype(jnp.float32))
        edge_mask = (lv.edge_mask if lv.edge_mask is not None
                     else (s_gid < ng).astype(jnp.float32))
        b1 = jnp.zeros((nb, lv.s_pad, lv.e_pad), jnp.float32)
        b1 = b1.at[_i32(lv.e_b), _i32(lv.e_src), _i32(lv.e_col)].set(
            -1.0, mode="drop"
        )
        b1 = b1.at[_i32(lv.e_b), _i32(lv.e_dst), _i32(lv.e_col)].set(
            1.0, mode="drop"
        )
        if lv.l0_v is not None:
            l0 = _scatter3(nb, lv.s_pad, lv.s_pad, lv.l0_b, lv.l0_r, lv.l0_c,
                           lv.l0_v)
            l1 = _scatter3(nb, lv.e_pad, lv.e_pad, lv.l1_b, lv.l1_r, lv.l1_c,
                           lv.l1_v)
            deg = lv.deg
        else:
            # derived mode: L0/L1 from B1 on device.  The Gram products are
            # small integers (exact even through the MXU's bf16 passes);
            # only the ×(2/λmax) rounds.  Padding rows/cols of B1 are zero
            # and the dump bucket's scale is 0, so padding stays zero.
            sc_n = lv.g_scale[n_gid]  # [nb, S], 0 on padding rows
            sc_e = lv.g_scale[s_gid]
            l0 = jnp.einsum(
                "gse,gte->gst", b1, b1, preferred_element_type=jnp.float32
            ) * sc_n[..., None]
            l1 = jnp.einsum(
                "gse,gsf->gef", b1, b1, preferred_element_type=jnp.float32
            ) * sc_e[..., None]
            deg = jnp.sum(jnp.abs(b1), axis=2)
        levels.append(
            DenseLevel(
                l0=l0, l1=l1, b1=b1,
                node_mask=node_mask, edge_mask=edge_mask, deg=deg,
                num_graphs=ng, n_gid=n_gid, s_gid=s_gid,
            )
        )
    pools = []
    for pl in batch.pools:
        nb = levels[0].l0.shape[0]
        p_t = _scatter3(nb, pl.sc, pl.sf, pl.t_b, pl.t_r, pl.t_c, 1.0)
        p_s = _scatter3(nb, pl.ec, pl.ef, pl.s_b, pl.s_r, pl.s_c, 1.0)
        p_t = p_t / jnp.maximum(p_t.sum(axis=2, keepdims=True), 1.0)
        p_s = p_s / jnp.maximum(p_s.sum(axis=2, keepdims=True), 1.0)
        pools.append(DensePool(p_t=p_t, p_s=p_s))
    return DenseBatch(
        x_t=x_t, x_s=x_s, y=y,
        levels=tuple(levels), pools=tuple(pools),
        num_graphs=batch.num_graphs,
    )


def maybe_inflate(batch):
    """Inflate compact batches; pass anything else through (Trainer hook)."""
    if isinstance(batch, CompactBatch):
        return inflate(batch)
    return batch


# ---------------------------------------------------------------------------
# host-side compaction (vectorized over the FlatSamples arenas)
# ---------------------------------------------------------------------------


def _gather_ranges(off: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Concatenated [off[i], off[i+1]) ranges for i in idx (vectorized)."""
    counts = (off[idx + 1] - off[idx]).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    starts = np.repeat(off[idx], counts)
    # position within each segment: arange(total) - segment start position
    seg_starts = np.repeat(np.cumsum(counts) - counts, counts)
    return starts + (np.arange(total, dtype=np.int64) - seg_starts)


def _pad_i32(a: np.ndarray, cap: int, fill: int) -> np.ndarray:
    out = np.full(cap, fill, np.int32)
    out[: a.size] = a
    return out


def _pad_ids(a: np.ndarray, cap: int, fill: int, maxval: int) -> np.ndarray:
    """Like ``_pad_i32`` but int16 when the value range fits (slim
    transfer); `inflate` widens on device."""
    dt = np.int16 if max(int(maxval), int(fill)) < 2**15 else np.int32
    out = np.full(cap, fill, dt)
    out[: a.size] = a
    return out


def _ids_dtype(maxval: int):
    return np.int16 if int(maxval) < 2**15 else np.int32


def _pad_f32(a: np.ndarray, cap: int) -> np.ndarray:
    out = np.zeros(cap, np.float32)
    out[: a.size] = a
    return out


def _round_cap(n: int, multiple: int) -> int:
    return max(-(-n // multiple) * multiple, multiple)


def flat_positions(
    bin_of: np.ndarray, offs: np.ndarray, sizes: np.ndarray, pad: int
) -> np.ndarray:
    """Flat [nb*pad] destination index of every row: slot g's rows land at
    bin_of[g]*pad + offs[g] + (0..sizes[g])."""
    sizes = sizes.astype(np.int64)
    total = int(sizes.sum())
    local = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(sizes) - sizes, sizes
    )
    return (
        np.repeat(bin_of.astype(np.int64), sizes) * pad
        + np.repeat(offs.astype(np.int64), sizes)
        + local
    )


def compact_operators(
    flat,
    sample_idx: np.ndarray,
    gid: np.ndarray,
    bin_of: np.ndarray,
    offs_n: list[np.ndarray],
    offs_e: list[np.ndarray],
    caps,
    nb: int,
    ng: int,
    nnz_multiple: int = 2048,
    nnz_caps: "list[tuple[int, int, int]] | None" = None,
    operators: str = "coo",
    slim: bool = True,
) -> tuple[list[CompactLevel], Any]:
    """COO operator arrays for a packed batch (see fast_collate for the
    placement computation).  Returns (levels, nnz_caps_used); pass
    ``nnz_caps`` back in to pin static shapes across batches.

    ``operators='derived'`` ships only B1 + per-graph 2/λmax scales; L0/L1
    and the degree vector are rebuilt on device by `inflate` (see
    CompactLevel docstring).

    ``slim`` (default): validity masks do not cross the link at all
    (derived from the gid fields), and every id column travels as int16
    when its value range fits — `inflate` widens on device.  Exact."""
    if operators not in ("coo", "derived"):
        raise ValueError(f"unknown operators mode {operators!r}")
    derived = operators == "derived"
    levels = []
    used = []
    for lv in range(flat.depth):
        fl = flat.levels[lv]
        # dense row metadata via the same placements
        s_pad, e_pad = caps[lv].nodes, caps[lv].edges
        gid_dt = _ids_dtype(ng) if slim else np.int32
        nm = np.zeros((nb, s_pad), np.float32)
        em = np.zeros((nb, e_pad), np.float32)
        deg = np.zeros((nb, s_pad), np.float32)
        n_gid = np.full((nb, s_pad), ng, gid_dt)
        s_gid = np.full((nb, e_pad), ng, gid_dt)
        n_sz = fl.num_nodes[sample_idx].astype(np.int64)
        e_sz = fl.num_edges[sample_idx].astype(np.int64)
        rows_flat = flat_positions(bin_of, offs_n[lv], n_sz, s_pad)
        nm.reshape(-1)[rows_flat] = 1.0
        n_gid.reshape(-1)[rows_flat] = np.repeat(gid, n_sz).astype(gid_dt)
        cols_flat = flat_positions(bin_of, offs_e[lv], e_sz, e_pad)
        em.reshape(-1)[cols_flat] = 1.0
        s_gid.reshape(-1)[cols_flat] = np.repeat(gid, e_sz).astype(gid_dt)

        # operators as COO with block-local indices
        if derived:
            l0_v = l1_v = np.zeros(0, np.float32)
        else:
            g0 = _gather_ranges(fl.l0_off, sample_idx)
            c0 = (fl.l0_off[sample_idx + 1] - fl.l0_off[sample_idx]).astype(
                np.int64
            )
            l0_b = np.repeat(bin_of, c0)
            no_rep = np.repeat(offs_n[lv], c0)
            l0_r = fl.l0_rows[g0] + no_rep
            l0_c = fl.l0_cols[g0] + no_rep
            l0_v = fl.l0_vals[g0]
            g1 = _gather_ranges(fl.l1_off, sample_idx)
            c1 = (fl.l1_off[sample_idx + 1] - fl.l1_off[sample_idx]).astype(
                np.int64
            )
            l1_b = np.repeat(bin_of, c1)
            eo_rep = np.repeat(offs_e[lv], c1)
            l1_r = fl.l1_rows[g1] + eo_rep
            l1_c = fl.l1_cols[g1] + eo_rep
            l1_v = fl.l1_vals[g1]
        ge = _gather_ranges(fl.e_off, sample_idx)
        e_b = np.repeat(bin_of, e_sz)
        no_e = np.repeat(offs_n[lv], e_sz)
        e_src = fl.src[ge] + no_e
        e_dst = fl.dst[ge] + no_e
        e_col = (cols_flat - np.repeat(bin_of.astype(np.int64), e_sz) * e_pad
                 ).astype(np.int32)
        if not derived:
            # degree: two increments per edge
            np.add.at(
                deg.reshape(-1),
                np.repeat(bin_of.astype(np.int64), e_sz) * s_pad + e_src, 1.0,
            )
            np.add.at(
                deg.reshape(-1),
                np.repeat(bin_of.astype(np.int64), e_sz) * s_pad + e_dst, 1.0,
            )

        if nnz_caps is not None:
            cap0, cap1, cape = nnz_caps[lv]
        else:
            cap0 = 0 if derived else _round_cap(l0_v.size, nnz_multiple)
            cap1 = 0 if derived else _round_cap(l1_v.size, nnz_multiple)
            cape = _round_cap(e_col.size, nnz_multiple)
        if l0_v.size > cap0 or l1_v.size > cap1 or e_col.size > cape:
            raise ValueError(
                f"level {lv} nnz ({l0_v.size}, {l1_v.size}, {e_col.size}) "
                f"exceeds caps ({cap0}, {cap1}, {cape})"
            )
        used.append((cap0, cap1, cape))
        if derived:
            g_scale = np.zeros(ng + 1, np.float32)
            g_scale[gid] = (2.0 / fl.max_eig[sample_idx]).astype(np.float32)
            op_fields = dict(
                l0_b=None, l0_r=None, l0_c=None, l0_v=None,
                l1_b=None, l1_r=None, l1_c=None, l1_v=None,
                deg=None, g_scale=g_scale,
            )
        else:
            pad = _pad_ids if slim else (
                lambda a, cap, fill, maxval: _pad_i32(a, cap, fill)
            )
            op_fields = dict(
                l0_b=pad(l0_b, cap0, nb, nb), l0_r=pad(l0_r, cap0, 0, s_pad),
                l0_c=pad(l0_c, cap0, 0, s_pad), l0_v=_pad_f32(l0_v, cap0),
                l1_b=pad(l1_b, cap1, nb, nb), l1_r=pad(l1_r, cap1, 0, e_pad),
                l1_c=pad(l1_c, cap1, 0, e_pad), l1_v=_pad_f32(l1_v, cap1),
                deg=deg, g_scale=None,
            )
        pad = _pad_ids if slim else (
            lambda a, cap, fill, maxval: _pad_i32(a, cap, fill)
        )
        levels.append(
            CompactLevel(
                e_b=pad(e_b, cape, nb, nb), e_src=pad(e_src, cape, 0, s_pad),
                e_dst=pad(e_dst, cape, 0, s_pad),
                e_col=pad(e_col, cape, 0, e_pad),
                node_mask=None if slim else nm,
                edge_mask=None if slim else em,
                n_gid=n_gid, s_gid=s_gid,
                num_graphs=ng, s_pad=s_pad, e_pad=e_pad,
                **op_fields,
            )
        )
    return levels, used

"""Pure-torch stand-ins for torch_geometric / torch_scatter / torch_cluster /
torchmetrics, sufficient to IMPORT AND EXECUTE the actual reference modules
(/root/reference/lib/*.py) on CPU with plain torch 2.x.

Purpose (VERDICT round 1, item 1): every parity oracle so far was re-derived
by the same builder that wrote the JAX code; a shared misreading would pass
every test.  This shim lets the *reference's own* ``HodgeLaguerreConv``,
``NodeEdgeInt``/``MSI``, ``SAPool``, ``gnn.Sequential`` stacks and full
``HL_HGCNN_*`` models run unmodified, so reference-produced activations can
be committed as true golden fixtures (scripts/make_reference_fixtures.py,
tests/test_reference_parity.py).

Semantics implemented faithfully (against the PyG 2.x behaviour the
reference depends on):

* ``MessagePassing.propagate`` — default flow ``source_to_target``, aggr
  ``add``: for each edge e, out[edge_index[1][e]] += message(x[edge_index[0]
  [e]], norm[e]); dim_size = x.size(0).  This is the only propagate pattern
  the reference uses (lib/Hodge_Cheb_Conv.py:494-507,:412-430).
* PyG dense ``Linear(weight_initializer='glorot')`` — U(-a, a) with
  a = sqrt(6/(fan_in+fan_out)); forward x @ W.T (weight [out, in]).
* ``gnn.Sequential(sig, [(mod, 'a, b -> c'), ...])`` — children registered
  as ``module_{i}`` (matches real PyG state-dict naming; verified against
  the shipped HL_HGAT_Brain.pt checkpoint).
* ``gnn.BatchNorm`` — wraps ``nn.BatchNorm1d`` as attribute ``module``
  (PyG naming: ``...module.weight`` in state dicts).
* ``torch_scatter.scatter_{add,mean,max}`` — index broadcast over trailing
  dims; scatter_max returns (values, argmax) with unfilled slots = 0 / -1.
* ``torch_cluster.graclus_cluster`` — delegates to this repo's C++
  ``graclus_match`` (bit-compatible NumPy fallback inside), returning the
  PyG convention: cluster id = matched partner min(u,v) or self id.

Dataset/loader surfaces (``InMemoryDataset``, ``GNNBenchmarkDataset``,
``ZINC``, ``DataLoader``…) exist so ``from lib.Hodge_Dataset import *``
succeeds; downloading raises (no egress here by design).

Usage::

    from scripts.pyg_shim import install
    install()                      # populates sys.modules
    sys.path.insert(0, "/root/reference")
    from lib.Hodge_Cheb_Conv import HodgeLaguerreConv   # the real one
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as _tnn


# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------

def _broadcast(index: torch.Tensor, src: torch.Tensor, dim: int):
    if index.dim() == 1:
        shape = [1] * src.dim()
        shape[dim] = -1
        index = index.view(shape)
    return index.expand_as(src)


def scatter_add(src, index, dim=0, out=None, dim_size=None):
    index = index.long()
    if dim < 0:
        dim = src.dim() + dim
    bidx = _broadcast(index, src, dim)
    if out is None:
        size = list(src.shape)
        size[dim] = int(index.max().item()) + 1 if dim_size is None else dim_size
        out = src.new_zeros(size)
    return out.scatter_add_(dim, bidx, src)


def scatter_mean(src, index, dim=0, out=None, dim_size=None):
    index = index.long()
    summed = scatter_add(src, index, dim=dim, dim_size=dim_size)
    ones = torch.ones(index.shape, dtype=src.dtype, device=src.device)
    count = scatter_add(
        ones, index, dim=0, dim_size=summed.shape[dim]
    ).clamp(min=1)
    shape = [1] * src.dim()
    shape[dim] = -1
    return summed / count.view(shape)


def scatter_max(src, index, dim=0, out=None, dim_size=None):
    index = index.long()
    if dim < 0:
        dim = src.dim() + dim
    size = list(src.shape)
    size[dim] = int(index.max().item()) + 1 if dim_size is None else dim_size
    bidx = _broadcast(index, src, dim)
    vals = src.new_full(size, float("-inf"))
    vals = vals.scatter_reduce(dim, bidx, src, reduce="amax",
                               include_self=True)
    # argmax: positions whose value equals the scattered max (ties → max pos)
    take = torch.gather(vals, dim, bidx) == src
    pos = torch.arange(src.shape[dim], device=src.device)
    shape = [1] * src.dim()
    shape[dim] = -1
    pos = pos.view(shape).expand_as(src)
    arg = torch.full(size, -1, dtype=torch.long, device=src.device)
    arg = arg.scatter_reduce(
        dim, bidx, torch.where(take, pos, torch.full_like(pos, -1)),
        reduce="amax", include_self=True)
    unfilled = torch.isinf(vals) & (vals < 0)
    vals = torch.where(unfilled, torch.zeros_like(vals), vals)
    return vals, arg


def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
    if reduce in ("sum", "add"):
        return scatter_add(src, index, dim=dim, out=out, dim_size=dim_size)
    if reduce == "mean":
        return scatter_mean(src, index, dim=dim, out=out, dim_size=dim_size)
    if reduce == "max":
        return scatter_max(src, index, dim=dim, out=out, dim_size=dim_size)[0]
    if reduce == "min":
        return -scatter_max(-src, index, dim=dim, dim_size=dim_size)[0]
    raise NotImplementedError(reduce)


# ---------------------------------------------------------------------------
# torch_geometric.utils
# ---------------------------------------------------------------------------

def maybe_num_nodes(edge_index, num_nodes=None):
    if num_nodes is not None:
        return num_nodes
    return int(edge_index.max().item()) + 1 if edge_index.numel() else 0


def degree(index, num_nodes=None, dtype=None):
    index = index.long()
    n = maybe_num_nodes(index.view(1, -1), num_nodes)
    out = torch.zeros(n, dtype=dtype or torch.float, device=index.device)
    ones = torch.ones(index.numel(), dtype=out.dtype, device=index.device)
    return out.scatter_add_(0, index.view(-1), ones)


def add_self_loops(edge_index, edge_attr=None, fill_value=1.0, num_nodes=None):
    n = maybe_num_nodes(edge_index, num_nodes)
    loop = torch.arange(n, device=edge_index.device)
    loop = loop.unsqueeze(0).repeat(2, 1)
    edge_index = torch.cat([edge_index, loop], dim=1)
    if edge_attr is not None:
        fill = edge_attr.new_full((n,) + edge_attr.shape[1:], fill_value)
        edge_attr = torch.cat([edge_attr, fill], dim=0)
    return edge_index, edge_attr


def dense_to_sparse(adj):
    idx = adj.nonzero(as_tuple=False).t()
    val = adj[idx[0], idx[1]]
    return idx, val


def coalesce(edge_index, edge_attr=None, num_nodes=None, reduce="sum"):
    n = maybe_num_nodes(edge_index, num_nodes)
    key = edge_index[0] * n + edge_index[1]
    order = key.argsort()
    key = key[order]
    uniq, inv = torch.unique(key, return_inverse=True)
    ei = torch.stack([uniq // n, uniq % n])
    if edge_attr is None:
        return ei
    attr = scatter(edge_attr[order], inv, dim=0, dim_size=uniq.numel(),
                   reduce=reduce)
    return ei, attr


def to_undirected(edge_index, edge_attr=None, num_nodes=None, reduce="add"):
    ei = torch.cat([edge_index, edge_index.flip(0)], dim=1)
    if edge_attr is None:
        return coalesce(ei, None, num_nodes)
    attr = torch.cat([edge_attr, edge_attr], dim=0)
    return coalesce(ei, attr, num_nodes, reduce=reduce)


def to_scipy_sparse_matrix(edge_index, edge_attr=None, num_nodes=None):
    import scipy.sparse as sp

    n = maybe_num_nodes(edge_index, num_nodes)
    row, col = edge_index.cpu().numpy()
    if edge_attr is None:
        import numpy as np

        edge_attr = np.ones(row.shape[0])
    else:
        edge_attr = edge_attr.view(-1).cpu().numpy()
    return sp.coo_matrix((edge_attr, (row, col)), (n, n))


def subgraph(subset, edge_index, edge_attr=None, relabel_nodes=False,
             num_nodes=None, return_edge_mask=False):
    n = maybe_num_nodes(edge_index, num_nodes)
    if subset.dtype != torch.bool:
        mask = torch.zeros(n, dtype=torch.bool, device=edge_index.device)
        mask[subset] = True
        subset = mask
    edge_mask = subset[edge_index[0]] & subset[edge_index[1]]
    ei = edge_index[:, edge_mask]
    attr = edge_attr[edge_mask] if edge_attr is not None else None
    if relabel_nodes:
        relabel = torch.full((n,), -1, dtype=torch.long,
                             device=edge_index.device)
        relabel[subset] = torch.arange(int(subset.sum()),
                                       device=edge_index.device)
        ei = relabel[ei]
    if return_edge_mask:
        return ei, attr, edge_mask
    return ei, attr


def softmax(src, index, ptr=None, num_nodes=None, dim=0):
    n = maybe_num_nodes(index.view(1, -1), num_nodes)
    mx = scatter_max(src, index, dim=dim, dim_size=n)[0]
    out = (src - mx.index_select(dim, index.long())).exp()
    denom = scatter_add(out, index, dim=dim, dim_size=n)
    return out / denom.index_select(dim, index.long()).clamp(min=1e-16)


def unbatch(src, batch, dim=0):
    sizes = degree(batch, dtype=torch.long).tolist()
    return src.split(sizes, dim)


def unbatch_edge_index(edge_index, batch):
    deg = degree(batch, dtype=torch.long)
    ptr = torch.cat([deg.new_zeros(1), deg.cumsum(0)[:-1]])
    edge_batch = batch[edge_index[0]]
    edge_index = edge_index - ptr[edge_batch]
    sizes = degree(edge_batch, dtype=torch.long).tolist()
    return edge_index.split(sizes, dim=1)


def remove_self_loops(edge_index, edge_attr=None):
    mask = edge_index[0] != edge_index[1]
    ei = edge_index[:, mask]
    return ei, (edge_attr[mask] if edge_attr is not None else None)


def remove_isolated_nodes(edge_index, edge_attr=None, num_nodes=None):
    """PyG semantics: drop nodes with no incident edge, relabel the rest to
    consecutive ids; returns (edge_index, edge_attr, keep_mask) (used by the
    DEMO MLGC_Weight, HL-HGAT-DEMO/lib/Hodge_Dataset.py:234)."""
    n = maybe_num_nodes(edge_index, num_nodes)
    mask = torch.zeros(n, dtype=torch.bool)
    mask[edge_index.view(-1)] = True
    relabel = torch.full((n,), -1, dtype=torch.long)
    relabel[mask] = torch.arange(int(mask.sum()))
    return relabel[edge_index], edge_attr, mask


class SparseTensor:
    """Minimal torch_sparse.SparseTensor: COO triple + transpose + matmul —
    the surface the DEMO ``HodgeLaguerreFastConv`` touches
    (HL-HGAT-DEMO/lib/Hodge_Cheb_Conv.py:349-350,578)."""

    def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
        self.row = row
        self.col = col
        self.value = value
        if sparse_sizes is None:
            sparse_sizes = (int(row.max()) + 1, int(col.max()) + 1)
        self.sparse_sizes = sparse_sizes

    def t(self):
        return SparseTensor(
            row=self.col, col=self.row, value=self.value,
            sparse_sizes=(self.sparse_sizes[1], self.sparse_sizes[0]),
        )


def sparse_matmul(adj, x, reduce="add"):
    """torch_sparse.matmul(adj, x): out[r] += value * x[c] per nonzero."""
    assert reduce in ("add", "sum")
    out = x.new_zeros(adj.sparse_sizes[0], x.shape[1])
    return out.index_add_(0, adj.row, adj.value.view(-1, 1) * x[adj.col])


# ---------------------------------------------------------------------------
# torch_geometric.data
# ---------------------------------------------------------------------------

class Data:
    """Minimal PyG Data: attribute bag + __inc__/__cat_dim__ hooks."""

    def __init__(self, x=None, edge_index=None, edge_attr=None, y=None,
                 pos=None, **kwargs):
        self.__dict__["_store"] = {}
        for k, v in dict(x=x, edge_index=edge_index, edge_attr=edge_attr,
                         y=y, pos=pos, **kwargs).items():
            if v is not None:
                setattr(self, k, v)

    def __setattr__(self, key, value):
        self._store[key] = value

    def __getattr__(self, key):
        store = self.__dict__.get("_store", {})
        if key in store:
            return store[key]
        raise AttributeError(key)

    def __delattr__(self, key):
        self._store.pop(key, None)

    def __contains__(self, key):
        return key in self._store

    @property
    def keys(self):
        return list(self._store.keys())

    def __inc__(self, key, value, *args, **kwargs):
        if "index" in key or key == "face":
            return self.num_nodes
        return 0

    def __cat_dim__(self, key, value, *args, **kwargs):
        if "index" in key or key == "face":
            return 1
        return 0

    @property
    def num_nodes(self):
        if "num_nodes" in self._store:
            return self._store["num_nodes"]
        if "x" in self._store and self._store["x"] is not None:
            return self._store["x"].shape[0]
        if "edge_index" in self._store:
            return maybe_num_nodes(self._store["edge_index"])
        return None

    @num_nodes.setter
    def num_nodes(self, v):
        self._store["num_nodes"] = v

    def to(self, device, *args, **kwargs):
        for k, v in self._store.items():
            if torch.is_tensor(v):
                self._store[k] = v.to(device)
        return self

    def clone(self):
        out = self.__class__.__new__(self.__class__)
        out.__dict__["_store"] = {
            k: (v.clone() if torch.is_tensor(v) else v)
            for k, v in self._store.items()
        }
        return out


class Batch(Data):
    @classmethod
    def from_data_list(cls, data_list, follow_batch=None, exclude_keys=None):
        out = cls.__new__(cls)
        out.__dict__["_store"] = {}
        keys = data_list[0].keys
        offsets = {k: 0 for k in keys}
        parts = {k: [] for k in keys}
        n_batch = []
        for i, d in enumerate(data_list):
            for k in keys:
                v = getattr(d, k)
                if torch.is_tensor(v):
                    inc = d.__inc__(k, v)
                    parts[k].append(v + offsets[k] if inc else v)
                    offsets[k] += inc
                else:
                    parts[k].append(v)
            n = d.num_nodes
            if n is not None:
                n_batch.append(torch.full((n,), i, dtype=torch.long))
        for k in keys:
            vals = parts[k]
            if torch.is_tensor(vals[0]):
                out._store[k] = torch.cat(
                    vals, dim=data_list[0].__cat_dim__(k, vals[0]))
            elif all(isinstance(v, (int, float)) for v in vals):
                # PyG collates graph-level scalars into a [batch] tensor
                out._store[k] = torch.tensor(vals)
            else:
                out._store[k] = vals
        if n_batch:
            out._store["batch"] = torch.cat(n_batch)
        out._store["num_graphs"] = len(data_list)
        return out


class _NoDownload:
    def __init__(self, *a, **k):
        raise RuntimeError(
            "pyg_shim dataset stubs cannot download (no egress); "
            "use hl_hgat_tpu.data ingestion instead"
        )


class Dataset(torch.utils.data.Dataset):
    """Import-surface stub: reference Dataset subclasses call super().__init__
    with (root, transform, ...) then implement their own len/get."""

    def __init__(self, root=None, transform=None, pre_transform=None,
                 pre_filter=None):
        self.root = root
        self.transform = transform
        self.pre_transform = pre_transform
        self.pre_filter = pre_filter

    def len(self):  # pragma: no cover - subclass responsibility
        raise NotImplementedError

    def get(self, idx):  # pragma: no cover
        raise NotImplementedError

    def __len__(self):
        return self.len()

    def __getitem__(self, idx):
        d = self.get(idx)
        return d if self.transform is None else self.transform(d)


class InMemoryDataset(Dataset):
    pass


def download_url(url, folder, log=True, filename=None):  # pragma: no cover
    raise RuntimeError(f"pyg_shim: no egress, cannot download {url}")


def extract_zip(path, folder, log=True):  # pragma: no cover
    import zipfile

    with zipfile.ZipFile(path, "r") as z:
        z.extractall(folder)


# ---------------------------------------------------------------------------
# torch_geometric.nn
# ---------------------------------------------------------------------------

class Linear(_tnn.Module):
    """PyG dense.linear.Linear: weight [out, in], optional glorot init."""

    def __init__(self, in_channels, out_channels, bias=True,
                 weight_initializer=None, bias_initializer=None):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.weight_initializer = weight_initializer
        self.weight = _tnn.Parameter(torch.empty(out_channels, in_channels))
        if bias:
            self.bias = _tnn.Parameter(torch.empty(out_channels))
        else:
            self.register_parameter("bias", None)
        self.reset_parameters()

    def reset_parameters(self):
        if self.weight_initializer == "glorot":
            a = math.sqrt(6.0 / (self.in_channels + self.out_channels))
            with torch.no_grad():
                self.weight.uniform_(-a, a)
        else:
            _tnn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        if self.bias is not None:
            with torch.no_grad():
                self.bias.zero_()

    def forward(self, x):
        return torch.nn.functional.linear(x, self.weight, self.bias)


def zeros(t):
    if t is not None:
        with torch.no_grad():
            t.zero_()


def glorot(t):
    if t is not None:
        a = math.sqrt(6.0 / (t.shape[-2] + t.shape[-1]))
        with torch.no_grad():
            t.uniform_(-a, a)


class MessagePassing(_tnn.Module):
    """add-aggregation source_to_target propagate — the only pattern the
    reference uses (lib/Hodge_Cheb_Conv.py:442-443,:518-519)."""

    def __init__(self, aggr="add", flow="source_to_target", node_dim=-2,
                 **kwargs):
        super().__init__()
        assert aggr in ("add", "sum"), f"shim supports add aggr, got {aggr}"
        assert flow == "source_to_target"
        self.aggr = aggr
        self.flow = flow

    def propagate(self, edge_index, x=None, norm=None, size=None, **kwargs):
        src, dst = edge_index[0].long(), edge_index[1].long()
        x_j = x.index_select(0, src)
        msg = self.message(x_j=x_j, norm=norm, **kwargs)
        dim_size = x.shape[0] if size is None or size[1] is None else size[1]
        return scatter_add(msg, dst, dim=0, dim_size=dim_size)

    def message(self, x_j, norm=None):  # pragma: no cover - overridden
        return x_j if norm is None else norm.view(-1, 1) * x_j


class BatchNorm(_tnn.Module):
    """PyG gnn.BatchNorm: BatchNorm1d registered as child ``module``."""

    def __init__(self, in_channels, eps=1e-5, momentum=0.1, affine=True,
                 track_running_stats=True):
        super().__init__()
        self.module = _tnn.BatchNorm1d(in_channels, eps, momentum, affine,
                                       track_running_stats)

    def forward(self, x):
        return self.module(x)


class Sequential(_tnn.Module):
    """String-DSL sequential container; children named ``module_{i}`` to
    match real PyG state-dict keys (checked against HL_HGAT_Brain.pt)."""

    def __init__(self, input_args: str, modules):
        super().__init__()
        self.input_names = [a.strip() for a in input_args.split(",")]
        self.signatures = []
        self.callables = []
        for i, entry in enumerate(modules):
            if isinstance(entry, (tuple, list)):
                mod, sig = entry
            else:
                mod, sig = entry, None
            if isinstance(mod, _tnn.Module):
                self.add_module(f"module_{i}", mod)
            self.callables.append(mod)
            if sig is None:
                self.signatures.append((None, None))
            else:
                ins, outs = sig.split("->")
                self.signatures.append((
                    [a.strip() for a in ins.split(",")],
                    [a.strip() for a in outs.split(",")],
                ))

    def forward(self, *args):
        env = dict(zip(self.input_names, args))
        out = None
        for mod, (ins, outs) in zip(self.callables, self.signatures):
            if ins is None:
                out = mod(out)
                continue
            out = mod(*[env[a] for a in ins])
            if len(outs) == 1:
                env[outs[0]] = out
            else:
                for name, val in zip(outs, out):
                    env[name] = val
        return out


def global_mean_pool(x, batch, size=None):
    return scatter_mean(x, batch, dim=0, dim_size=size)


def global_max_pool(x, batch, size=None):
    return scatter_max(x, batch, dim=0, dim_size=size)[0]


def graclus(edge_index, weight=None, num_nodes=None):
    n = maybe_num_nodes(edge_index, num_nodes)
    return graclus_cluster(edge_index[0], edge_index[1], weight, n)


def max_pool(cluster, data, transform=None):  # pragma: no cover - unused path
    raise NotImplementedError("pyg_shim: max_pool not required by fixtures")


# ---------------------------------------------------------------------------
# torch_cluster
# ---------------------------------------------------------------------------

def graclus_cluster(row, col, weight=None, num_nodes=None):
    """Delegate to this repo's graclus (C++ with NumPy fallback); PyG
    convention: unmatched nodes map to themselves, matched pairs to a shared
    representative id."""
    import numpy as np

    from hl_hgat_tpu.complex import coarsen

    n = num_nodes or (int(max(row.max(), col.max())) + 1)
    w = None if weight is None else weight.detach().cpu().numpy()
    lab = coarsen.graclus_cluster(
        row.detach().cpu().numpy().astype(np.int64),
        col.detach().cpu().numpy().astype(np.int64),
        w,
        n,
    )
    return torch.from_numpy(np.asarray(lab, dtype=np.int64))


# ---------------------------------------------------------------------------
# torchmetrics (tiny)
# ---------------------------------------------------------------------------

class F1Score:
    def __init__(self, task="binary", num_classes=2, average="macro",
                 threshold=0.5, **kw):
        self.threshold = threshold
        self.preds, self.targets = [], []

    def to(self, device):
        return self

    def __call__(self, preds, target):
        self.update(preds, target)
        return self.compute()

    def update(self, preds, target):
        self.preds.append(preds.detach().cpu())
        self.targets.append(target.detach().cpu())

    def compute(self):
        p = torch.cat([x.view(-1) for x in self.preds])
        t = torch.cat([x.view(-1) for x in self.targets])
        if p.dtype.is_floating_point:
            p = (p > self.threshold).long()
        tp = ((p == 1) & (t == 1)).sum().float()
        fp = ((p == 1) & (t == 0)).sum().float()
        fn = ((p == 0) & (t == 1)).sum().float()
        denom = 2 * tp + fp + fn
        return (2 * tp / denom) if denom > 0 else torch.tensor(0.0)

    def reset(self):
        self.preds, self.targets = [], []


BinaryF1Score = F1Score


# ---------------------------------------------------------------------------
# module assembly
# ---------------------------------------------------------------------------

def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install():
    """Populate sys.modules with the shim packages (idempotent)."""
    if "torch_geometric" in sys.modules and getattr(
        sys.modules["torch_geometric"], "__pyg_shim__", False
    ):
        return

    tg = _mod("torch_geometric")
    tg.__pyg_shim__ = True

    utils = _mod(
        "torch_geometric.utils",
        add_self_loops=add_self_loops,
        remove_self_loops=remove_self_loops,
        dense_to_sparse=dense_to_sparse,
        degree=degree,
        to_undirected=to_undirected,
        coalesce=coalesce,
        to_scipy_sparse_matrix=to_scipy_sparse_matrix,
        subgraph=subgraph,
        softmax=softmax,
        unbatch=unbatch,
        unbatch_edge_index=unbatch_edge_index,
        maybe_num_nodes=maybe_num_nodes,
        remove_isolated_nodes=remove_isolated_nodes,
    )
    _mod("torch_geometric.utils.num_nodes", maybe_num_nodes=maybe_num_nodes)
    utils.num_nodes = sys.modules["torch_geometric.utils.num_nodes"]

    data_mod = _mod(
        "torch_geometric.data",
        Data=Data,
        Batch=Batch,
        Dataset=Dataset,
        InMemoryDataset=InMemoryDataset,
        download_url=download_url,
        extract_zip=extract_zip,
    )

    nn_mod = _mod(
        "torch_geometric.nn",
        Sequential=Sequential,
        BatchNorm=BatchNorm,
        Linear=Linear,
        MessagePassing=MessagePassing,
        global_mean_pool=global_mean_pool,
        global_max_pool=global_max_pool,
        graclus=graclus,
        max_pool=max_pool,
    )
    _mod("torch_geometric.nn.conv", MessagePassing=MessagePassing)
    _mod("torch_geometric.nn.dense", )
    _mod("torch_geometric.nn.dense.linear", Linear=Linear)
    _mod("torch_geometric.nn.inits", zeros=zeros, glorot=glorot)
    _mod("torch_geometric.nn.pool", graclus=graclus, max_pool=max_pool)
    nn_mod.conv = sys.modules["torch_geometric.nn.conv"]
    nn_mod.dense = sys.modules["torch_geometric.nn.dense"]
    nn_mod.inits = sys.modules["torch_geometric.nn.inits"]
    nn_mod.pool = sys.modules["torch_geometric.nn.pool"]

    _mod("torch_geometric.typing", OptTensor=object,
         SparseTensor=SparseTensor)
    _mod("torch_sparse", SparseTensor=SparseTensor, matmul=sparse_matmul)

    class _DataLoader(torch.utils.data.DataLoader):
        def __init__(self, dataset, batch_size=1, shuffle=False, **kw):
            kw.setdefault("collate_fn", Batch.from_data_list)
            super().__init__(dataset, batch_size=batch_size,
                             shuffle=shuffle, **kw)

    _mod("torch_geometric.loader", DataLoader=_DataLoader)
    _mod(
        "torch_geometric.datasets",
        GNNBenchmarkDataset=_NoDownload,
        ZINC=_NoDownload,
    )
    tg.utils = utils
    tg.data = data_mod
    tg.nn = nn_mod
    tg.loader = sys.modules["torch_geometric.loader"]
    tg.datasets = sys.modules["torch_geometric.datasets"]
    tg.typing = sys.modules["torch_geometric.typing"]

    _mod(
        "torch_scatter",
        scatter=scatter,
        scatter_add=scatter_add,
        scatter_mean=scatter_mean,
        scatter_max=scatter_max,
    )
    _mod("torch_cluster", graclus_cluster=graclus_cluster)
    tm = _mod("torchmetrics", F1Score=F1Score)
    _mod("torchmetrics.classification", BinaryF1Score=BinaryF1Score,
         F1Score=F1Score)
    tm.classification = sys.modules["torchmetrics.classification"]

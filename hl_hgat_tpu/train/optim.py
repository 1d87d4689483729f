"""Optimizers and schedules.

``adam_l2`` reproduces torch Adam with ``weight_decay`` (L2 added to the
gradient BEFORE the moment updates — not decoupled AdamW), the optimizer of
every reference script (e.g. reference main_zinc...py:209).

``ReduceLROnPlateau`` is a host-side state machine mirroring torch's
scheduler (patience/factor/min_lr, reference main_zinc...py:210-211); the
current scale feeds the jitted update through ``optax.inject_hyperparams``.
"""

from __future__ import annotations

import dataclasses

import optax


def adam_l2(
    learning_rate: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    flatten: bool | None = None,
) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) semantics, with an injectable lr.

    ``flatten`` runs the moment updates on ONE raveled parameter vector
    (optax.flatten).  Measured DEFAULT OFF (benchmarks/RESULTS.md round 2):
    the ravel itself costs two ~27.5 MB concatenates + a flat-vector update
    (~475 us/step in the device trace), MORE than the ~100 per-leaf update
    fusions it replaces — flagship 1.789M with flatten vs 1.932M without.
    Per-element math identical either way (HLHGAT_FLAT_OPT=1 re-enables)."""

    if flatten is None:
        import os

        flatten = os.environ.get("HLHGAT_FLAT_OPT", "0") == "1"

    @optax.inject_hyperparams
    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        steps.append(optax.scale_by_learning_rate(learning_rate))  # scale(-lr)
        chain = optax.chain(*steps)
        return optax.flatten(chain) if flatten else chain

    return make(learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr inside an ``adam_l2`` optimizer state."""
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Plateau scheduler (torch semantics, rel threshold).

    ``mode='min'`` tracks a loss (improvement = ``m < best*(1-threshold)``);
    ``mode='max'`` tracks a score such as validation accuracy (improvement =
    ``m > best*(1+threshold)``) — the CIFAR10-SP script schedules on
    accuracy this way (reference main_cifar10SP_HL_HGCNN_dense_int3_attpool
    .py:201-202, ``mode='max'``)."""

    lr: float
    patience: int = 10
    factor: float = 0.5
    min_lr: float = 1e-6
    threshold: float = 1e-4
    mode: str = "min"

    best: float | None = None
    num_bad: int = 0

    def __post_init__(self) -> None:
        if self.mode not in ("min", "max"):
            raise ValueError(f"mode must be 'min' or 'max', got {self.mode!r}")
        if self.best is None:
            self.best = float("inf") if self.mode == "min" else float("-inf")

    def _improved(self, metric: float) -> bool:
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Feed the validation metric; returns the (possibly reduced) lr."""
        if self._improved(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

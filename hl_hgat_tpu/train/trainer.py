"""The training loop.

One jitted ``train_step`` / ``eval_step`` pair per model replaces the
reference's per-script Python loops (reference main_zinc...py:151-177).
Semantics kept: Adam + torch-style L2, ReduceLROnPlateau on the validation
loss, checkpoint only when the validation metric beats gate + best
(reference main_zinc...py:241-248), optional early stop when the lr decays
below a floor (reference main_TSP...py:421-422).

TPU notes: the whole step (forward, loss, backward, optimizer, BN stat
update) is one XLA program; batches arrive as padded `ComplexBatch` pytrees
with identical shapes so there is exactly one compilation per pad bucket.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hl_hgat_tpu.complex.batch import ComplexBatch
from hl_hgat_tpu.train import losses as L
from hl_hgat_tpu.train import metrics as M
from hl_hgat_tpu.train.optim import ReduceLROnPlateau, adam_l2, set_learning_rate

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array
    rng: Array


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    # regression|classification|multilabel|edge_binary|brain|
    # node_classification|link_prediction
    task: str = "regression"
    lr: float = 1e-3
    weight_decay: float = 1e-3
    plateau_patience: int = 10
    plateau_factor: float = 0.5
    min_lr: float = 1e-6
    early_stop_lr: float | None = None
    save_gate: float | None = None  # metric floor/ceiling for checkpointing
    metric_mode: str = "min"  # 'min' (MAE) or 'max' (acc/F1/AP)
    denorm: float = 1.0  # MAE denormalization (ZINC: 2.0109)
    log_path: str | None = None
    ckpt_dir: str | None = None
    seed: int = 0
    # device-side eigen-PE sign-flip augmentation: number of leading static
    # (non-PE) feature columns, or None to disable (the reference flips per
    # sample on CPU, lib/Hodge_Dataset.py:429-439; here per batch on device)
    pe_flip_node_static: int | None = None
    pe_flip_edge_static: int | None = None
    # on-device TSP structure augmentation: fresh label-protected edge-
    # simplex dropout (L1 masking + logit-mask column) each step at static
    # shapes (complex/augment.py tsp_dropout_device; reference
    # lib/Hodge_Dataset.py:690-708 applies it per sample at load time with
    # aug_prob=0.75).  None = off; else the apply probability.
    tsp_aug_prob: float | None = None
    # collate batch k+1 on a daemon thread while step k dispatches (the
    # reference's DataLoader num_workers analog, data/prefetch.py); 0 = off
    prefetch: int = 2
    # failure recovery: ALSO save the full state every N epochs (to
    # <ckpt_dir>/latest) regardless of metric improvement, so a crashed run
    # resumes from its last epoch rather than its last improvement
    # (SURVEY.md §5 failure-detection plan); 0 = off
    ckpt_every: int = 0
    # PRNG implementation for the training stream ('threefry2x32' default;
    # 'rbg' uses the TPU-native hardware generator — cheaper random bits
    # for dropout-heavy models at the cost of a different, non-default
    # stream; same key-splitting API, see jax.random docs)
    prng_impl: str = "threefry2x32"


def _loss_for(task: str):
    if task == "regression":
        return lambda out, batch: L.l1_loss(
            out.reshape(-1), batch.y.reshape(-1)
        )
    if task == "brain":
        # the OHBM training loop's criterion: MSELoss on z-scored scores
        # (reference HL-HGAT-DEMO/OHBM_DEMO.ipynb cell 40)
        return lambda out, batch: L.mse_loss(
            out.reshape(-1), batch.y.reshape(-1)
        )
    if task == "classification":
        return lambda out, batch: L.softmax_ce_loss(
            out, batch.y.reshape(-1).astype(jnp.int32)
        )
    if task == "multilabel":
        return lambda out, batch: L.focal_loss(out, batch.y)
    if task == "edge_binary":
        # flatten mask too: dense layouts carry [G, E] masks
        return lambda out, batch: L.focal_loss(
            out.reshape(-1),
            batch.y.reshape(-1),
            batch.level0.edge_mask.reshape(-1),
        )
    if task == "node_classification":
        # per-node CE masked by node validity (PascalVOC-SP / COCO-SP —
        # beyond-reference heads; the reference ships the loaders,
        # lib/LRGBDataset.py:26-306, but no model)
        return lambda out, batch: L.softmax_ce_loss(
            out.reshape(-1, out.shape[-1]),
            batch.y.reshape(-1).astype(jnp.int32),
            batch.level0.node_mask.reshape(-1),
        )
    if task == "link_prediction":
        # per-pair BCE over the batch-carried queries (PCQM-Contact —
        # beyond-reference head; the reference ships the loader's
        # edge_label fields, lib/LRGBDataset.py:81-95, but no model)
        return lambda out, batch: L.bce_logits_loss(
            out.reshape(-1), batch.y.reshape(-1), batch.pair_mask
        )
    raise ValueError(f"unknown task {task!r}")


class Trainer:
    """Owns the jitted steps, the plateau scheduler, and checkpoint gating."""

    def __init__(self, model, config: TrainerConfig):
        self.model = model
        self.cfg = config
        self.tx = adam_l2(config.lr, config.weight_decay)
        self.plateau = ReduceLROnPlateau(
            lr=config.lr,
            patience=config.plateau_patience,
            factor=config.plateau_factor,
            min_lr=config.min_lr,
        )
        self._loss_fn = _loss_for(config.task)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self.best_metric = np.inf if config.metric_mode == "min" else -np.inf
        self.history: list[dict] = []

    # -- state ---------------------------------------------------------------

    def init_state(self, example_batch: ComplexBatch) -> TrainState:
        from hl_hgat_tpu.complex.compact import maybe_inflate

        example_batch = maybe_inflate(example_batch)
        # param init always uses the default threefry stream so weights are
        # reproducible across prng_impl choices; only the TRAINING stream
        # (dropout/aug bits, split per step) switches implementation
        rng = jax.random.key(self.cfg.seed)
        p_rng, d_rng, s_rng = jax.random.split(rng, 3)
        if self.cfg.prng_impl != "threefry2x32":
            s_rng = jax.random.key(
                self.cfg.seed ^ 0x5EED, impl=self.cfg.prng_impl
            )
        variables = self.model.init(
            {"params": p_rng, "dropout": d_rng}, example_batch,
            deterministic=True,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=s_rng,
        )

    def maybe_restore(
        self, state: TrainState, prefer: str = "newest"
    ) -> tuple[TrainState, int]:
        """Resume from a checkpoint in ``ckpt_dir`` if present.

        ``prefer='newest'`` (resume semantics) picks whichever of the
        best-so-far checkpoint and the periodic ``latest/`` save has the
        higher epoch; ``prefer='best'`` (test/inference semantics) only
        considers the metric-gated best checkpoint.

        Returns (state, start_epoch).  Restores params, BN stats, optimizer
        moments, step and PRNG — a true resume, which the reference (saving
        only state_dict) could not do (SURVEY.md §5)."""
        cfg = self.cfg
        if not cfg.ckpt_dir:
            return state, 1
        from hl_hgat_tpu.train.checkpoint import (
            load_metadata,
            restore_checkpoint,
        )
        import os

        def has_ckpt(d):
            return os.path.exists(os.path.join(d, "state.npz")) or (
                os.path.exists(os.path.join(d, "state"))
            )

        dirs = (
            (cfg.ckpt_dir,)
            if prefer == "best"
            else (cfg.ckpt_dir, os.path.join(cfg.ckpt_dir, "latest"))
        )
        candidates = [d for d in dirs if has_ckpt(d)]
        if not candidates:
            return state, 1
        chosen = max(
            candidates, key=lambda d: int(load_metadata(d).get("epoch", 0))
        )
        restored = restore_checkpoint(chosen, state)
        meta = load_metadata(chosen)
        if "best_metric" in meta:
            self.best_metric = meta["best_metric"]
        elif "metric" in meta:
            self.best_metric = meta["metric"]
        if "lr" in meta:
            self.plateau.lr = meta["lr"]
        return restored, int(meta.get("epoch", 0)) + 1

    # -- steps ---------------------------------------------------------------

    def _apply(self, params, batch_stats, batch, *, train: bool, rng=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = self.model.apply(
                variables, batch, deterministic=False,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            return out, mutated["batch_stats"]
        out = self.model.apply(variables, batch, deterministic=True)
        return out, batch_stats

    def _train_step_impl(self, state: TrainState, batch: ComplexBatch):
        from hl_hgat_tpu.complex.compact import maybe_inflate

        # compact batches densify on device — only COO triplets crossed the
        # host->device link (complex/compact.py)
        batch = maybe_inflate(batch)
        rng, step_rng = jax.random.split(state.rng)
        cfg = self.cfg
        if cfg.pe_flip_node_static is not None or cfg.pe_flip_edge_static is not None:
            from hl_hgat_tpu.complex.augment import pe_sign_flip

            k_t, k_s = jax.random.split(jax.random.fold_in(step_rng, 1))
            x_t, x_s = batch.x_t, batch.x_s
            if cfg.pe_flip_node_static is not None:
                x_t = pe_sign_flip(k_t, x_t, num_static=cfg.pe_flip_node_static)
            if cfg.pe_flip_edge_static is not None:
                x_s = pe_sign_flip(k_s, x_s, num_static=cfg.pe_flip_edge_static)
            batch = batch.replace(x_t=x_t, x_s=x_s)
        if cfg.tsp_aug_prob is not None:
            from hl_hgat_tpu.complex.augment import tsp_dropout_device

            batch = tsp_dropout_device(
                jax.random.fold_in(step_rng, 2), batch,
                apply_prob=cfg.tsp_aug_prob,
            )

        def loss_fn(params):
            out, new_stats = self._apply(
                params, state.batch_stats, batch, train=True, rng=step_rng
            )
            if isinstance(out, tuple):
                out = out[0]
            return self._loss_fn(out, batch), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
                step=state.step + 1,
                rng=rng,
            ),
            loss,
        )

    def _eval_step_impl(self, state: TrainState, batch: ComplexBatch):
        from hl_hgat_tpu.complex.compact import maybe_inflate

        batch = maybe_inflate(batch)
        out, _ = self._apply(
            state.params, state.batch_stats, batch, train=False
        )
        if isinstance(out, tuple):
            out = out[0]
        return out, self._loss_fn(out, batch)

    def train_epoch(self, state: TrainState, batches: Iterable[ComplexBatch]):
        # Loss stays on device until epoch end: a per-step float() readback
        # would gate every dispatch on the device (≈30 ms RTT through the
        # tunnel) and serialize the host collate against the step — with
        # lazy accumulation the host races ahead, overlapping collate and
        # dispatch with device compute, and pays ONE readback per epoch.
        total, n = None, 0
        for batch in batches:
            state, loss = self._train_step(state, batch)
            contrib = loss * batch.num_graphs
            total = contrib if total is None else total + contrib
            n += batch.num_graphs
        if total is None:
            return state, 0.0
        return state, float(np.asarray(total)) / max(n, 1)

    def evaluate(self, state: TrainState, batches: Iterable[ComplexBatch]):
        # Like train_epoch, everything stays on device until the end of the
        # loop: per-batch float()/np.asarray() readbacks would gate every
        # dispatch on a device round-trip (~30 ms through the tunnel) and
        # make evaluation cost as much as the whole training epoch.
        cfg = self.cfg
        total, n = None, 0
        preds, ys = [], []
        f1s = []
        accs = []
        node_masks = []
        for batch in batches:
            out, loss = self._eval_step(state, batch)
            g = batch.num_graphs
            contrib = loss * g
            total = contrib if total is None else total + contrib
            n += g
            if cfg.task == "edge_binary":
                lvl = batch.level0
                if hasattr(lvl, "s_id"):  # COO layout
                    seg, o, yy, m = lvl.s_id, out, batch.y, lvl.edge_mask
                else:  # dense layouts: flatten [G, E] rows
                    from hl_hgat_tpu.complex.compact import (
                        _scatter_rows,
                        level_edge_mask,
                    )

                    emask = level_edge_mask(lvl)
                    if lvl.s_gid is not None:  # packed superblocks
                        seg = lvl.s_gid.reshape(-1).astype(jnp.int32)
                    else:  # one graph per block
                        seg = jnp.broadcast_to(
                            jnp.arange(emask.shape[0])[:, None],
                            emask.shape,
                        ).reshape(-1)
                    o = out.reshape(-1)
                    yy = batch.y
                    if getattr(batch, "y_packed", False):
                        # row-packed edge labels → dense [B, E] rows
                        yy = _scatter_rows(
                            jnp.asarray(yy), jnp.asarray(batch.x_s_rows),
                            lvl.num_blocks, lvl.e_pad,
                        )
                    yy = yy.reshape(-1)
                    m = emask.reshape(-1)
                f1s.append(M.per_graph_binary_f1(o, yy, seg, g, m) * g)
            elif cfg.task == "classification":
                accs.append(M.accuracy(out, batch.y.reshape(-1)) * g)
            elif cfg.task == "node_classification":
                preds.append(out.reshape(-1, out.shape[-1]))
                ys.append(jnp.asarray(batch.y).reshape(-1))
                node_masks.append(
                    jnp.asarray(batch.level0.node_mask).reshape(-1)
                )
            elif cfg.task == "link_prediction":
                preds.append(out.reshape(-1))
                ys.append(jnp.asarray(batch.y).reshape(-1))
                node_masks.append(jnp.asarray(batch.pair_mask).reshape(-1))
            else:
                preds.append(out.reshape(-1, out.shape[-1]))
                ys.append(jnp.asarray(batch.y).reshape(-1, out.shape[-1]))
        loss_avg = (
            float(np.asarray(total)) / max(n, 1) if total is not None else 0.0
        )
        if cfg.task == "regression":
            p = np.asarray(jnp.concatenate(preds).reshape(-1))
            y = np.asarray(jnp.concatenate(ys).reshape(-1))
            metric = float(np.mean(np.abs(p - y))) * cfg.denorm
        elif cfg.task == "brain":
            # the notebook's test metric: Pearson correlation of the
            # normalized predictions vs scores (OHBM_DEMO.ipynb cell 42)
            p = jnp.concatenate(preds).reshape(-1)
            y = jnp.concatenate(ys).reshape(-1)
            metric = float(np.asarray(M.pearson_corr(p, y)))
        elif cfg.task == "classification":
            metric = float(np.asarray(sum(accs))) / max(n, 1)
        elif cfg.task == "multilabel":
            metric = M.eval_ap(
                np.asarray(jnp.concatenate(ys)),
                np.asarray(jnp.concatenate(preds)),
            )
        elif cfg.task == "node_classification":
            lg = np.asarray(jnp.concatenate(preds))
            metric = M.macro_f1(
                lg,
                np.asarray(jnp.concatenate(ys)),
                num_classes=lg.shape[-1],
                mask=np.asarray(jnp.concatenate(node_masks)),
            )
        elif cfg.task == "link_prediction":
            # groups are (1 positive first, n_neg negatives) contiguous
            # rows (attach_link_pairs) → MRR is a reshape
            p = np.asarray(jnp.concatenate(preds))
            y = np.asarray(jnp.concatenate(ys))
            m = np.asarray(jnp.concatenate(node_masks)) > 0
            p, y = p[m], y[m]
            q = int(y.sum())
            group = len(y) // max(q, 1)
            scores = p[: q * group].reshape(q, group)
            metric = M.mrr(scores[:, 0], scores[:, 1:])
        else:
            metric = float(np.asarray(sum(f1s))) / max(n, 1)
        return loss_avg, metric

    # -- fit -----------------------------------------------------------------

    def _improved(self, metric: float) -> bool:
        cfg = self.cfg
        if cfg.metric_mode == "min":
            gated = cfg.save_gate is None or metric < cfg.save_gate
            return gated and metric < self.best_metric
        gated = cfg.save_gate is None or metric > cfg.save_gate
        return gated and metric > self.best_metric

    def fit(
        self,
        state: TrainState,
        train_batches: Callable[[], Iterable[ComplexBatch]],
        val_batches: Callable[[], Iterable[ComplexBatch]],
        *,
        epochs: int,
        on_improve: Callable[[TrainState, float], None] | None = None,
        verbose: bool = True,
        resume: bool = False,
    ) -> TrainState:
        cfg = self.cfg
        start = time.time()
        start_epoch = 1
        if resume:
            state, start_epoch = self.maybe_restore(state)
            if verbose and start_epoch > 1:
                print(f"resumed from epoch {start_epoch - 1}")
        from hl_hgat_tpu.data.prefetch import prefetch

        for epoch in range(start_epoch, epochs + 1):
            state, train_loss = self.train_epoch(
                state, prefetch(train_batches(), cfg.prefetch)
            )
            val_loss, val_metric = self.evaluate(
                state, prefetch(val_batches(), cfg.prefetch)
            )
            lr = self.plateau.step(val_loss)
            state = dataclasses.replace(
                state, opt_state=set_learning_rate(state.opt_state, lr)
            )
            improved = self._improved(val_metric)
            if improved:
                self.best_metric = val_metric
                if on_improve is not None:
                    on_improve(state, val_metric)
                if cfg.ckpt_dir:
                    from hl_hgat_tpu.train.checkpoint import save_checkpoint

                    save_checkpoint(cfg.ckpt_dir, state, extra=dict(
                        epoch=epoch, metric=val_metric, lr=lr,
                    ))
            if cfg.ckpt_every and cfg.ckpt_dir and (
                epoch % cfg.ckpt_every == 0
            ):
                import os as _os

                from hl_hgat_tpu.train.checkpoint import save_checkpoint

                save_checkpoint(
                    _os.path.join(cfg.ckpt_dir, "latest"), state,
                    extra=dict(epoch=epoch, metric=val_metric, lr=lr,
                               best_metric=self.best_metric),
                )
            rec = dict(
                epoch=epoch, time=time.time() - start, train_loss=train_loss,
                val_loss=val_loss, val_metric=val_metric, lr=lr,
                improved=improved,
            )
            self.history.append(rec)
            if verbose:
                print(
                    f"Epoch {epoch:03d} t={rec['time']:.1f}s "
                    f"train={train_loss:.4f} val={val_loss:.4f} "
                    f"metric={val_metric:.4f} lr={lr:.2e}"
                    + (" *saved*" if improved else "")
                )
            if cfg.log_path:
                with open(cfg.log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            if cfg.early_stop_lr is not None and lr < cfg.early_stop_lr:
                break
        return state

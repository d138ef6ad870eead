"""Jitted train/valid step builders.

Each trainer's whole step — forward, loss, grads, optimizer update, metric
dict — is one compiled function of (state, batch, rng). Step-dependent
schedules ride on ``state.step`` as traced scalars; all host↔device traffic
per step is one batch in, one metrics dict out.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from viet_tts_tpu.models.fastspeech2.loss import total_loss
from viet_tts_tpu.train.state import TrainState


def cast_tree(tree, dtype):
    """Cast every floating leaf; non-float leaves pass through."""
    return jax.tree_util.tree_map(
        lambda x: (
            x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x
        ),
        tree,
    )


def make_fs2_train_step(
    model, criterion, mixed_precision: bool = False, grad_accum: int = 1
) -> Callable:
    """FastSpeech2/AdaSpeech acoustic train step
    (role of `fastspeech2_trainer.py:125-148`).

    mixed_precision=True runs the forward/backward in bfloat16 (params and
    float inputs cast inside the loss; the MXU runs bf16 at 2x fp32 and HBM
    traffic halves) while the master params, optimizer state and loss
    reductions stay float32 — the standard TPU training posture. bf16's
    8-bit exponent matches fp32's range, so no loss scaling is needed.

    grad_accum=A splits the batch's leading axis into A micro-batches,
    accumulates their gradients inside a `lax.scan` (activation memory
    drops A-fold; one optimizer update on the averaged grads), letting an
    effective batch exceed HBM. BN statistics chain through the scan, each
    micro-batch gets its own dropout fold. With data parallelism the
    per-micro-batch size B/A must still divide the mesh's data axis.
    """
    half = jnp.bfloat16

    def micro_loss(params, batch, bstats, step, drop_rng, rep_rng):
        if mixed_precision:
            params = cast_tree(params, half)
            fwd_batch = cast_tree(batch, half)
        else:
            fwd_batch = batch
        # running BN statistics stay fp32 even under mixed precision:
        # the momentum update m*ra + (1-m)*stat adds increments far
        # below one bf16 ulp, so bf16 accumulators would freeze; the
        # bf16 batch stat upcasts into the fp32 update instead.
        (y_pred, y_extra), mut = model.apply(
            {"params": params, "batch_stats": bstats},
            text=fwd_batch["text"],
            text_lengths=fwd_batch["text_lengths"],
            feats=fwd_batch["feats"],
            feats_lengths=fwd_batch["feats_lengths"],
            duration=fwd_batch["duration"],
            pitch=fwd_batch["pitch"],
            energy=fwd_batch["energy"],
            sids=fwd_batch["sids"],
            aids=fwd_batch["aids"],
            step=step,
            train=True,
            rngs={"dropout": drop_rng, "reparam": rep_rng},
            mutable=["batch_stats"],
        )
        if mixed_precision:
            # losses reduce in fp32 against the fp32 targets
            y_pred = cast_tree(y_pred, jnp.float32)
            y_extra = cast_tree(y_extra, jnp.float32)
            mut = cast_tree(mut, jnp.float32)
        targets = (
            batch["feats"],
            batch["word_ids"],
            batch["word_ids"].shape[1],
            *y_extra,
        )
        losses = criterion(y_pred, targets, step=step)
        return total_loss(losses), (losses, mut)

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)
        drop_rng, rep_rng = jax.random.split(step_rng)

        if grad_accum == 1:
            (tot, (losses, mut)), grads = jax.value_and_grad(
                micro_loss, has_aux=True
            )(state.params, batch, state.batch_stats, state.step,
              drop_rng, rep_rng)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    grad_accum, x.shape[0] // grad_accum, *x.shape[1:]
                )
                if hasattr(x, "ndim") and x.ndim > 0
                else x,
                batch,
            )

            def body(carry, inp):
                bstats, gacc, tacc, lacc = carry
                i, mb = inp
                (tot_i, (losses_i, mut_i)), g_i = jax.value_and_grad(
                    micro_loss, has_aux=True
                )(state.params, mb, bstats, state.step,
                  jax.random.fold_in(drop_rng, i),
                  jax.random.fold_in(rep_rng, i))
                gacc = jax.tree_util.tree_map(jnp.add, gacc, g_i)
                lacc = jax.tree_util.tree_map(jnp.add, lacc, losses_i)
                return (mut_i["batch_stats"], gacc, tacc + tot_i, lacc), None

            zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
            # shape-only trace for the loss-dict accumulator structure
            _, (losses_shape, _) = jax.eval_shape(
                micro_loss, state.params, mb0, state.batch_stats,
                state.step, drop_rng, rep_rng,
            )
            zeros_l = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), losses_shape
            )
            (bstats, gsum, tsum, lsum), _ = jax.lax.scan(
                body,
                (state.batch_stats, zeros_g, jnp.float32(0.0), zeros_l),
                (jnp.arange(grad_accum), micro),
            )
            inv = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
            losses = jax.tree_util.tree_map(lambda l: l * inv, lsum)
            tot = tsum * inv
            mut = {"batch_stats": bstats}
        state = state.apply_gradients(
            grads=grads, batch_stats=mut["batch_stats"]
        )
        metrics = dict(losses)
        metrics["total"] = tot
        return state, metrics

    train_step.micro_loss = micro_loss  # exposed for the accumulation oracle
    return train_step


def make_fs2_valid_step(model, criterion) -> Callable:
    """Held-out feat/feat_postnet losses (`fastspeech2_trainer.py:150-162`)."""

    def valid_step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        (y_pred, y_extra), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            text=batch["text"],
            text_lengths=batch["text_lengths"],
            feats=batch["feats"],
            feats_lengths=batch["feats_lengths"],
            duration=batch["duration"],
            pitch=batch["pitch"],
            energy=batch["energy"],
            sids=batch["sids"],
            aids=batch["aids"],
            step=state.step,
            train=False,
            mutable=["batch_stats"],
        )
        targets = (
            batch["feats"],
            batch["word_ids"],
            batch["word_ids"].shape[1],
            *y_extra,
        )
        losses = criterion(y_pred, targets, step=None)
        return {k: v for k, v in losses.items()}

    return valid_step

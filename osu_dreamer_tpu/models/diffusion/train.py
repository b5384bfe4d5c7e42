"""Stage-2 training step for the latent denoiser.

Capability parity with reference models/diffusion/train.py:
- per-frame metric ``frame_dist_sq`` = sum over channels, mean over length,
  making E[d^2] = 2E independent of sequence length (:22-31);
- stratified logit-normal interpolation times (:78-80);
- distance-marching losses (arXiv:2602.02928): inverse-distance-weighted
  one-step denoising `osl` + directional eikonal `del` at weights 1 / 30
  (:86-98), plus the `u_mape` monitoring metric (:101);
- an EMA (0.99) copy of the parameters updated every step; validation runs
  on the EMA weights (:67,125-126,138).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from osu_dreamer_tpu.train.state import (
    OptimizerArgs,
    TrainState,
    create_train_state,
    ema_update,
    make_optimizer,
    stratified_logit_normal_t,
)

from .model import DiffusionModel, DiffusionModelArgs


@dataclass
class DiffusionTrainArgs:
    opt: OptimizerArgs = field(default_factory=lambda: OptimizerArgs(lr=3e-4))
    osl_weight: float = 1.0
    del_weight: float = 30.0
    ema_decay: float = 0.99
    val_batches: int = 8


class LatentBatch(NamedTuple):
    """cached latent-space training batch, channel-last"""

    h: jnp.ndarray       # (B, l, A) audio features at latent rate
    z: jnp.ndarray       # (B, l, E) chart latents
    s: jnp.ndarray       # (B, S) style codes
    labels: jnp.ndarray  # (B, NUM_LABELS)


def frame_dist_sq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """squared distance in the per-frame metric: channel sum, length mean"""
    d = (a - b).astype(jnp.float32)
    return (d * d).sum(axis=-1).mean(axis=-1)


def diffusion_loss(
    model: DiffusionModel,
    params: Any,
    rng: jax.Array,
    batch: LatentBatch,
    args: DiffusionTrainArgs,
    train: bool = True,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    B = batch.z.shape[0]
    k_t, k_noise = jax.random.split(rng)

    t = stratified_logit_normal_t(k_t, B)
    x0 = jax.random.normal(k_noise, batch.z.shape, jnp.float32)
    x1 = batch.z.astype(jnp.float32)
    xt = x0 + t[:, None, None] * (x1 - x0)

    u_pred, v_pred = model.apply(params, batch.h, batch.s, xt, train=train)

    c0 = model.args.c0
    d_sq = frame_dist_sq(xt, x1)
    u_target = jnp.sqrt(d_sq + c0)

    # one-step denoising, weighted by inverse squared distance
    denoised = xt - u_pred[:, None, None] * v_pred.astype(jnp.float32)
    osl = (frame_dist_sq(denoised, x1) / (d_sq + c0)).mean()

    # directional eikonal: length-neutral supervision of the direction field
    v_target = (xt - x1) / u_target[:, None, None]
    del_ = frame_dist_sq(v_pred, v_target).mean()

    loss = args.osl_weight * osl + args.del_weight * del_
    u_mape = (jnp.abs(u_pred - u_target) / u_target).mean()

    return loss, {"loss": loss, "osl": osl, "del": del_, "u_mape": u_mape}


def make_train_step(
    model: DiffusionModel, tx: optax.GradientTransformation, args: DiffusionTrainArgs
):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: LatentBatch):
        rng, step_rng = jax.random.split(state.rng)

        grad_fn = jax.value_and_grad(
            lambda p: diffusion_loss(model, p, step_rng, batch, args), has_aux=True
        )
        (_, aux), grads = grad_fn(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            rng=rng,
            ema_params=ema_update(state.ema_params, params, args.ema_decay),
        )
        return new_state, aux

    return train_step


def init_diffusion_training(
    model_args: DiffusionModelArgs,
    train_args: DiffusionTrainArgs,
    rng: jax.Array,
    seq_len: int,
):
    """-> (model, state, train_step)"""
    model = DiffusionModel(model_args)
    k_init, k_state = jax.random.split(rng)
    params = model.init(
        k_init,
        jnp.zeros((2, seq_len, model_args.a_dim)),
        jnp.zeros((2, model_args.style_dim)),
        jnp.zeros((2, seq_len, model_args.emb_dim)),
    )
    tx = make_optimizer(train_args.opt)
    state = create_train_state(params, tx, k_state, with_ema=True)
    return model, state, make_train_step(model, tx, train_args)

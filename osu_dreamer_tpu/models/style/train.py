"""Stage-3 training step for the style prior.

Capability parity with reference models/style/train.py: the same
distance-marching losses as the denoiser, applied to style vectors
(:56-85); CFG-style label dropout — each of the 5 labels independently
replaced by -1 with probability .2 (:65); per-step EMA 0.99. The generative
validation suite (NN-distance ratios, per-condition recall, sample spread,
energy distance, :111-160) lives in ``evaluate_style``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from osu_dreamer_tpu.train.state import (
    OptimizerArgs,
    TrainState,
    create_train_state,
    ema_update,
    make_optimizer,
    stratified_logit_normal_t,
)

from .model import StyleModel, StyleModelArgs


@dataclass
class StyleTrainArgs:
    opt: OptimizerArgs = field(default_factory=lambda: OptimizerArgs(lr=3e-4))
    label_drop_prob: float = 0.2
    osl_weight: float = 1.0
    del_weight: float = 30.0
    ema_decay: float = 0.99


def style_loss(
    model: StyleModel,
    params: Any,
    rng: jax.Array,
    s1: jnp.ndarray,       # (B, S) real style codes
    labels: jnp.ndarray,   # (B, NUM_LABELS)
    args: StyleTrainArgs,
    train: bool = True,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    B = s1.shape[0]
    k_t, k_noise, k_drop = jax.random.split(rng, 3)

    t = stratified_logit_normal_t(k_t, B)
    s1 = s1.astype(jnp.float32)
    s0 = jax.random.normal(k_noise, s1.shape)
    st = s0 + t[:, None] * (s1 - s0)

    if train and args.label_drop_prob > 0:
        drop = jax.random.uniform(k_drop, labels.shape) < args.label_drop_prob
        labels = jnp.where(drop, -1.0, labels)

    u_pred, v_pred = model.apply(params, st, labels)
    v_pred = v_pred.astype(jnp.float32)

    c0 = model.args.c0
    d_sq = ((st - s1) ** 2).sum(axis=1)
    u_target = jnp.sqrt(d_sq + c0)

    denoised = st - u_pred[:, None] * v_pred
    osl = (((denoised - s1) ** 2).sum(axis=1) / (d_sq + c0)).mean()

    v_target = (st - s1) / u_target[:, None]
    del_ = ((v_pred - v_target) ** 2).sum(axis=1).mean()

    loss = args.osl_weight * osl + args.del_weight * del_
    u_mape = (jnp.abs(u_pred - u_target) / u_target).mean()

    return loss, {"loss": loss, "osl": osl, "del": del_, "u_mape": u_mape}


def make_train_step(model: StyleModel, tx: optax.GradientTransformation, args: StyleTrainArgs):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, s: jnp.ndarray, labels: jnp.ndarray):
        rng, step_rng = jax.random.split(state.rng)

        grad_fn = jax.value_and_grad(
            lambda p: style_loss(model, p, step_rng, s, labels, args), has_aux=True
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


# ------------------------------------------------------------ validation --


def energy_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """E-distance between two sample sets (reference style/train.py:153-160)"""

    def cdist(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return jnp.sqrt(jnp.maximum(d2, 1e-12))

    def offdiag_mean(a):
        n = a.shape[0]
        return (cdist(a, a) * (1 - jnp.eye(n))).sum() / (n * (n - 1))

    return 2 * cdist(x, y).mean() - offdiag_mean(x) - offdiag_mean(y)


def evaluate_style(
    model: StyleModel,
    ema_params: Any,
    s_real: jnp.ndarray,
    labels: jnp.ndarray,
    rng: jax.Array,
    num_samples: int = 4,
    sample_steps: int = 16,
) -> dict[str, float]:
    """generative quality metrics on the EMA model (reference :111-151):
    nearest-neighbor distance ratios (all and SR>=5), per-condition recall
    over K samples, same-condition sample spread, and energy distance.

    Jitted in one program: the metric math is dozens of ops, and eager
    per-op dispatch is ruinous over a relayed backend."""
    B = s_real.shape[0]
    if B < 2:
        return {}

    metrics_fn, nn_ratio_fn = _metric_fns(model)
    out = {
        k: float(v)
        for k, v in metrics_fn(
            ema_params, s_real, labels, rng, num_samples, sample_steps
        ).items()
    }

    # SR>=5 subset ratio (data-dependent subset size -> gathered on host)
    hi = np.asarray(labels[:, 0] >= 5.0)
    if int(hi.sum()) > 1:
        out["nn_ratio_sr5"] = float(
            nn_ratio_fn(
                ema_params, s_real[hi], labels[hi], rng, num_samples, sample_steps
            )
        )
    return out


def _cdist(a, b):
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


# jitted metric programs cached per model instance (flax Modules are not
# hashable, so they can't be jit static args; the entry keeps the model ref
# alive so its id stays unique)
_METRIC_FNS: dict[int, tuple] = {}


def _metric_fns(model):
    cached = _METRIC_FNS.get(id(model))
    if cached is not None:
        return cached[1:]

    def sample_stack(ema_params, labels, rng, num_samples, sample_steps):
        keys = jax.random.split(rng, num_samples)
        return jnp.stack(
            [model.apply(ema_params, labels, k, sample_steps, method=StyleModel.sample) for k in keys]
        )  # (K, B, S)

    @partial(jax.jit, static_argnums=(4, 5))
    def metrics(ema_params, s_real, labels, rng, num_samples, sample_steps):
        B = s_real.shape[0]
        samp = sample_stack(ema_params, labels, rng, num_samples, sample_steps)
        flat = samp.reshape(-1, samp.shape[-1])

        d_rr = _cdist(s_real, s_real) + jnp.inf * jnp.eye(B)
        rr = d_rr.min(axis=1).mean()

        per_cond = jnp.swapaxes(samp, 0, 1)  # (B, K, S)
        k = num_samples
        pair = jax.vmap(_cdist)(per_cond, per_cond).sum()

        return {
            "nn_ratio": _cdist(flat, s_real).min(axis=1).mean() / rr,
            "cond_recall": jnp.linalg.norm(samp - s_real[None], axis=-1).min(axis=0).mean(),
            "energy_dist": energy_distance(flat, s_real),
            "sample_spread": pair / (k * (k - 1) * B) / rr,
        }

    @partial(jax.jit, static_argnums=(4, 5))
    def nn_ratio(ema_params, s_real, labels, rng, num_samples, sample_steps):
        B = s_real.shape[0]
        samp = sample_stack(ema_params, labels, rng, num_samples, sample_steps)
        d_rr = _cdist(s_real, s_real) + jnp.inf * jnp.eye(B)
        rr = d_rr.min(axis=1).mean()
        return _cdist(samp.reshape(-1, samp.shape[-1]), s_real).min(axis=1).mean() / rr

    _METRIC_FNS[id(model)] = (model, metrics, nn_ratio)
    return metrics, nn_ratio


def init_style_training(
    model_args: StyleModelArgs, train_args: StyleTrainArgs, rng: jax.Array
):
    """-> (model, state, train_step)"""
    from osu_dreamer_tpu.signal import NUM_LABELS

    model = StyleModel(model_args)
    k_init, k_state = jax.random.split(rng)
    params = model.init(
        k_init, jnp.zeros((2, model_args.style_dim)), jnp.zeros((2, NUM_LABELS))
    )
    tx = make_optimizer(train_args.opt)
    state = create_train_state(params, tx, k_state, with_ema=True)
    return model, state, make_train_step(model, tx, train_args)

"""Functional train state: parameters, optimizer, EMA, auxiliary stats.

Replaces the stateful pieces of the reference's Lightning modules: AdamW +
LambdaLR (latent/train.py configure_optimizers), gradient clipping
(model.yml gradient_clip_val: 1), per-batch EMA AveragedModel
(diffusion/train.py:67,125-126), and the latent trainer's per-component
loss-EMA buffers (latent/train.py:67-71) — all as one pytree that moves
through jitted steps and into orbax checkpoints.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from osu_dreamer_tpu.nn import LRScheduleArgs, make_lr_schedule


@dataclass
class OptimizerArgs:
    lr: float = 3e-4
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    schedule: LRScheduleArgs = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.schedule is None:
            self.schedule = LRScheduleArgs()


def make_optimizer(args: OptimizerArgs) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.adamw(
            make_lr_schedule(args.lr, args.schedule),
            weight_decay=args.weight_decay,
        ),
    )


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    # EMA of params (denoiser/style; None for the latent stage)
    ema_params: Optional[Any] = None
    # per-component loss-EMA normalizer (latent stage only)
    loss_ema: Optional[jnp.ndarray] = None
    loss_ema_ready: Optional[jnp.ndarray] = None


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    with_ema: bool = False,
    n_loss_components: int = 0,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
        ema_params=jax.tree.map(jnp.copy, params) if with_ema else None,
        loss_ema=jnp.ones(n_loss_components) if n_loss_components else None,
        loss_ema_ready=jnp.zeros((), bool) if n_loss_components else None,
    )


def ema_update(ema: Any, params: Any, decay: float = 0.99) -> Any:
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, params)


def stratified_logit_normal_t(rng: jax.Array, n: int) -> jnp.ndarray:
    """stratified logit-normal interpolation times (reference
    diffusion/train.py:78-80): permuted strata + in-stratum jitter pushed
    through the normal quantile and a sigmoid — lower gradient variance than
    iid draws"""
    k_perm, k_jitter = jax.random.split(rng)
    strata = jax.random.permutation(k_perm, n).astype(jnp.float32)
    u = (strata + jax.random.uniform(k_jitter, (n,))) / n
    z = jax.scipy.special.ndtri(jnp.clip(u, 1e-6, 1.0 - 1e-6))
    return jax.nn.sigmoid(z)

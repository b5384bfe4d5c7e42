"""fit-style: wire config -> style-code streams -> train loop.

Validation parity with reference style/train.py:111-160: the whole val split's
style codes + labels are collected, the distance-marching losses are scored
on the EMA model, and the generative metric suite (NN-distance ratios,
per-condition recall, sample spread, energy distance) is logged; the
checkpoint monitor is val/energy_dist.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from osu_dreamer_tpu.data import hold_out_mapsets, latent_windows, prefetch
from osu_dreamer_tpu.data.pipeline import count_latent_windows
from osu_dreamer_tpu.parallel import ParallelArgs, build_parallelism
from osu_dreamer_tpu.nn.schedule import lr_at
from osu_dreamer_tpu.train.loop import FitArgs, Stage, fit
from osu_dreamer_tpu.train.state import TrainState
from osu_dreamer_tpu.utils import dataclass_from_dict, load_yaml_config

from .model import StyleModelArgs
from .train import StyleTrainArgs, evaluate_style, init_style_training, style_loss


@dataclass
class StyleDataArgs:
    data_dir: str = "./data"
    batch_size: int = 512
    max_val_count: int = 512
    max_val_frac: float = 0.3
    shuffle_buffer: int = 512


def run(config_path: str | Path | None = None, resume_from: str | None = None) -> TrainState:
    config_path = config_path or Path(__file__).parent / "config.yml"
    cfg = load_yaml_config(config_path)

    model_args = dataclass_from_dict(StyleModelArgs, cfg.get("model", {}))
    train_args = dataclass_from_dict(StyleTrainArgs, cfg.get("train", {}))
    data_args = dataclass_from_dict(StyleDataArgs, cfg.get("data", {}))
    fit_args = dataclass_from_dict(FitArgs, cfg.get("fit", {}))
    par = build_parallelism(
        dataclass_from_dict(ParallelArgs, cfg.get("parallel", {})),
        data_args.batch_size,
    )
    if par.sp_axis is not None:
        raise ValueError(
            "parallel.sp applies to the denoiser stage only (its backbone "
            "is sequence-parallel-aware); this stage scales via dp/tp"
        )

    train_sets, val_sets = hold_out_mapsets(
        Path(data_args.data_dir), "*.latent.npz",
        data_args.max_val_count, data_args.max_val_frac,
    )

    rng = jax.random.PRNGKey(fit_args.seed)
    model, state, train_step_fn = init_style_training(model_args, train_args, rng)

    lockstep = par.lockstep_steps(count_latent_windows(
        train_sets, None, shard=par.input_shard,
    )) if par.process_count > 1 else None

    def train_stream(epoch: int):
        # style codes are per-map: stream full maps, keep (s, labels)
        stream = (
            (s.s, s.labels)
            for s in latent_windows(
                train_sets, None, shuffle_buffer=data_args.shuffle_buffer,
                seed=fit_args.seed + epoch, shard=par.input_shard,
            )
        )
        batches = prefetch(_batched_pairs(stream, par.local_batch_size))
        batches = par.lockstep_stream(batches, lockstep)
        for styles, labels in batches:
            batch = (jnp.asarray(styles), jnp.asarray(labels))
            yield par.shard_batch(batch)

    def train_step(state: TrainState, batch):
        return train_step_fn(state, batch[0], batch[1])

    # collect the val split once (it's small: max_val_count maps)
    val_s_list, val_label_list = [], []
    for sample in latent_windows(val_sets, None):
        val_s_list.append(sample.s)
        val_label_list.append(sample.labels)
    val_s = jnp.asarray(np.stack(val_s_list)) if val_s_list else None
    val_labels = jnp.asarray(np.stack(val_label_list)) if val_label_list else None

    @jax.jit
    def val_loss(params, s, labels, rng):
        _, aux = style_loss(model, params, rng, s, labels, train_args, train=False)
        return aux

    def validate(state: TrainState) -> dict[str, float]:
        if val_s is None:
            return {}
        key = jax.random.PRNGKey(0)
        aux = val_loss(state.ema_params, val_s, val_labels, key)
        out = {f"val/{k}": float(v) for k, v in aux.items()}
        gen = evaluate_style(model, state.ema_params, val_s, val_labels, key)
        out.update({f"val/{k}": v for k, v in gen.items()})
        return out

    stage = Stage(
        name="style",
        hparams={"model": cfg.get("model", {}), "train": cfg.get("train", {})},
        state=state,
        train_step=train_step,
        train_stream=train_stream,
        validate=validate,
        prepare_state=par.prepare_state,
        lr_schedule=lambda step: lr_at(step, train_args.opt.lr, train_args.opt.schedule),
    )
    return fit(stage, fit_args, resume_from)


def _batched_pairs(stream, batch_size: int):
    buf_s, buf_l = [], []
    for s, l in stream:
        buf_s.append(s)
        buf_l.append(l)
        if len(buf_s) == batch_size:
            yield np.stack(buf_s), np.stack(buf_l)
            buf_s, buf_l = [], []
    # drop_last semantics for stable jit shapes

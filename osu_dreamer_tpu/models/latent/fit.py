"""fit-latent: wire config -> data streams -> train loop for stage 1.

Validation parity with reference latent/train.py:191-271: full-map val at
batch 1 computing threshold-free onset soft-Dice, cursor velocity R^2, their
harmonic-mean ``eval/score`` (the checkpoint/early-stop monitor), cursor
pixel MAE, label MAE, min per-dim z variance (posterior-collapse canary),
plus a spectrogram/signal reconstruction figure per epoch.

Full maps have ragged lengths; they are bucket-padded (multiples of
2*chunk*BUCKET_CHUNKS frames) so validation compiles a handful of shapes,
and every metric is computed under a valid-length mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from osu_dreamer_tpu.data import (
    batched,
    hold_out_mapsets,
    pad_to_multiple,
    prefetch,
    signal_windows,
)
from osu_dreamer_tpu.data.pipeline import count_signal_windows
from osu_dreamer_tpu.parallel import ParallelArgs, build_parallelism
from osu_dreamer_tpu.signal import Channel
from osu_dreamer_tpu.nn.schedule import lr_at
from osu_dreamer_tpu.train.loop import FitArgs, Stage, fit
from osu_dreamer_tpu.train.state import TrainState
from osu_dreamer_tpu.utils import dataclass_from_dict, load_yaml_config

from .model import LatentModel, LatentModelArgs
from .train import Batch, LatentTrainArgs, init_latent_training

BUCKET_CHUNKS = 32  # val bucket = 2 * chunk * this many chunks (~10 s)


@dataclass
class LatentDataArgs:
    data_dir: str = "./data"
    seq_len: int = 2052
    batch_size: int = 32
    max_val_count: int = 64
    max_val_frac: float = 0.3
    max_per_map: int = 1
    shuffle_buffer: int = 1


def _playfield_scale():
    return jnp.array([512.0, 384.0], jnp.float32)


def make_val_fn(model: LatentModel):
    """jitted full-map eval (one compile per padded length via the static
    L_pad arg): loss-free reconstruction metrics"""

    @partial(jax.jit, static_argnums=(4,))
    def val_metrics(params, spec, chart, labels, L_pad, length):
        z, s = model.apply(params, chart, method=LatentModel.encode_chart)
        pred_chart, pred_labels = model.apply(
            params, z, s, spec, method=_decode_with_spec
        )

        mask = (jnp.arange(L_pad) < length).astype(jnp.float32)[None, :]

        t = chart[..., Channel.ONSET].astype(jnp.float32) * mask
        p = pred_chart[..., Channel.ONSET].astype(jnp.float32) * mask

        scale = _playfield_scale()
        true_xy = chart[..., 7:].astype(jnp.float32) * scale
        pred_xy = pred_chart[..., 7:].astype(jnp.float32) * scale
        vmask = (mask[:, 1:] * mask[:, :-1])[..., None]
        true_v = jnp.diff(true_xy, axis=1) * vmask
        pred_v = jnp.diff(pred_xy, axis=1) * vmask
        v_mean = true_v.sum(axis=1, keepdims=True) / jnp.maximum(vmask.sum(), 1.0)

        z_var_min = z.astype(jnp.float32).var(axis=(0, 1)).min()
        n = jnp.maximum(mask.sum(), 1.0)

        return {
            "on_tt": (t * t).sum(),
            "on_pt": (p * t).sum(),
            "on_pp": (p * p).sum(),
            "cur_res": ((pred_v - true_v) ** 2).sum(),
            "cur_tot": (((true_v - v_mean) * vmask) ** 2).sum(),
            "cursor_px_mae": (jnp.abs(pred_xy - true_xy) * mask[..., None]).sum()
            / (n * 2),
            "label_mae": jnp.abs(pred_labels - labels).mean(),
            "z_var_min": z_var_min,
        }

    # flax method-reference helper: decode with spec (audio) conditioning
    def _decode_with_spec(mod: LatentModel, z, s, spec):
        return mod.decode(z, s, spec=spec)

    return val_metrics


def run(config_path: str | Path | None = None, resume_from: str | None = None) -> TrainState:
    config_path = config_path or Path(__file__).parent / "config.yml"
    cfg = load_yaml_config(config_path)

    model_args = dataclass_from_dict(LatentModelArgs, cfg.get("model", {}))
    train_args = dataclass_from_dict(LatentTrainArgs, cfg.get("train", {}))
    data_args = dataclass_from_dict(LatentDataArgs, cfg.get("data", {}))
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

    chunk2 = 2 * model_args.chunk_size
    assert data_args.seq_len % chunk2 == 0, (
        f"seq_len {data_args.seq_len} must be a multiple of {chunk2}"
    )

    train_sets, val_sets = hold_out_mapsets(
        Path(data_args.data_dir), "*.map.npy",
        data_args.max_val_count, data_args.max_val_frac,
    )

    rng = jax.random.PRNGKey(fit_args.seed)
    model, state, train_step = init_latent_training(
        model_args, train_args, rng, data_args.seq_len
    )

    lockstep = par.lockstep_steps(count_signal_windows(
        train_sets, data_args.seq_len, data_args.max_per_map, shard=par.input_shard,
    )) if par.process_count > 1 else None

    def train_stream(epoch: int) -> Iterator[Batch]:
        stream = signal_windows(
            train_sets,
            data_args.seq_len,
            shuffle_buffer=data_args.shuffle_buffer,
            max_per_map=data_args.max_per_map,
            seed=fit_args.seed + epoch,
            shard=par.input_shard,
        )
        batches = prefetch(batched(stream, par.local_batch_size))
        batches = par.lockstep_stream(batches, lockstep)
        for b in batches:
            batch = Batch(*(jnp.asarray(x) for x in b))
            yield par.shard_batch(batch)

    bucket = chunk2 * BUCKET_CHUNKS
    val_fn = make_val_fn(model)

    def validate(state: TrainState) -> dict[str, float]:
        sums = {k: 0.0 for k in ("on_tt", "on_pt", "on_pp", "cur_res", "cur_tot")}
        per_map: dict[str, list[float]] = {"cursor_px_mae": [], "label_mae": [], "z_var_min": []}
        n_maps = 0
        for sample in signal_windows(val_sets, None, flip_augment=False):
            L = sample.audio.shape[0]
            spec = jnp.asarray(pad_to_multiple(sample.audio, bucket))[None]
            chart = jnp.asarray(pad_to_multiple(sample.chart, bucket))[None]
            labels = jnp.asarray(sample.labels)[None]
            m = val_fn(state.params, spec, chart, labels, spec.shape[1], L)
            for k in sums:
                sums[k] += float(m[k])
            for k in per_map:
                per_map[k].append(float(m[k]))
            n_maps += 1

        if n_maps == 0:
            return {}
        dice = 2 * sums["on_pt"] / max(sums["on_pp"] + sums["on_tt"], 1e-8)
        r2 = 1.0 - sums["cur_res"] / max(sums["cur_tot"], 1e-8)
        cursor_q = sums["cur_tot"] / max(sums["cur_tot"] + sums["cur_res"], 1e-8)
        score = 2 * dice * cursor_q / max(dice + cursor_q, 1e-8)
        return {
            "eval/hit/dice": dice,
            "eval/cursor/vel/r2": r2,
            "eval/score": score,
            **{f"eval/{k}": float(np.mean(v)) for k, v in per_map.items()},
        }

    @jax.jit
    def _plot_fwd(params, chart, spec):
        # jitted: an eager full-map forward is hundreds of per-op dispatches
        # (minutes per epoch over a relayed backend)
        z, s = model.apply(params, chart, method=LatentModel.encode_chart)
        pred, _ = model.apply(
            params, z, s, spec, method=lambda mod, z, s, sp: mod.decode(z, s, spec=sp)
        )
        return z, pred

    def on_validation(state: TrainState, step: int, logger) -> None:
        # reconstruction figure for the first val map (reference plot_val)
        try:
            sample = next(signal_windows(val_sets, None, flip_augment=False))
        except StopIteration:
            return
        spec = jnp.asarray(pad_to_multiple(sample.audio, bucket))[None]
        chart = jnp.asarray(pad_to_multiple(sample.chart, bucket))[None]
        z, pred = _plot_fwd(state.params, chart, spec)
        L = sample.audio.shape[0]
        x = np.asarray(chart[0, :L]).T
        p = np.asarray(pred[0, :L], dtype=np.float32).T
        z_up = np.repeat(np.asarray(z[0], np.float32), model_args.chunk_size, axis=0)[:L].T

        from osu_dreamer_tpu.data.plot import plot_signals

        with plot_signals(sample.audio.T, [x, p, x - p, z_up]) as fig:
            logger.figure("samples", fig, step)

    stage = Stage(
        name="latent",
        hparams={"model": cfg.get("model", {}), "train": cfg.get("train", {})},
        state=state,
        train_step=train_step,
        train_stream=train_stream,
        validate=validate,
        on_validation=on_validation,
        prepare_state=par.prepare_state,
        lr_schedule=lambda step: lr_at(step, train_args.opt.lr, train_args.opt.schedule),
    )
    return fit(stage, fit_args, resume_from)

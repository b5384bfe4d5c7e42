"""fit-denoiser: wire config -> cached-latent streams -> train loop.

Validation parity with reference diffusion/train.py:128-139: each held-out
full map is sliced into ``val_batches`` equal segments, stacked as a batch,
and scored with the distance-marching losses using the EMA weights; the
checkpoint monitor is val/loss.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from osu_dreamer_tpu.data import batched, hold_out_mapsets, latent_windows, prefetch
from osu_dreamer_tpu.data.pipeline import count_latent_windows
from osu_dreamer_tpu.parallel import ParallelArgs, build_parallelism
from osu_dreamer_tpu.nn.schedule import lr_at
from osu_dreamer_tpu.train.loop import FitArgs, Stage, fit
from osu_dreamer_tpu.train.state import TrainState
from osu_dreamer_tpu.utils import dataclass_from_dict, load_yaml_config

from .model import DiffusionModel, DiffusionModelArgs
from .train import (
    DiffusionTrainArgs,
    LatentBatch,
    diffusion_loss,
    init_diffusion_training,
)


@dataclass
class DiffusionDataArgs:
    data_dir: str = "./data"
    seq_len: int = 152
    batch_size: int = 128
    max_val_count: int = 128
    max_val_frac: float = 0.3
    max_per_map: int = 1
    shuffle_buffer: int = 512


def run(config_path: str | Path | None = None, resume_from: str | None = None) -> TrainState:
    config_path = config_path or Path(__file__).parent / "config.yml"
    cfg = load_yaml_config(config_path)

    model_args = dataclass_from_dict(DiffusionModelArgs, cfg.get("model", {}))
    train_args = dataclass_from_dict(DiffusionTrainArgs, cfg.get("train", {}))
    data_args = dataclass_from_dict(DiffusionDataArgs, cfg.get("data", {}))
    fit_args = dataclass_from_dict(FitArgs, cfg.get("fit", {}))
    par = build_parallelism(
        dataclass_from_dict(ParallelArgs, cfg.get("parallel", {})),
        data_args.batch_size,
    )

    train_sets, val_sets = hold_out_mapsets(
        Path(data_args.data_dir), "*.latent.npz",
        data_args.max_val_count, data_args.max_val_frac,
    )

    rng = jax.random.PRNGKey(fit_args.seed)
    model, state, train_step = init_diffusion_training(
        model_args, train_args, rng, data_args.seq_len
    )
    if par.sp_axis is not None:
        # sequence-parallel training: same params (init above is seq_axis-
        # free; the axis only changes the compute path), but the train step
        # runs under shard_map with the window length sharded over `sp` —
        # numerically identical to the unsharded step (test_parallel.py)
        from dataclasses import replace as _replace

        from osu_dreamer_tpu.train.state import make_optimizer

        from .train import make_sp_train_step

        n_sp = par.mesh.shape[par.sp_axis]
        if data_args.seq_len % n_sp != 0:
            raise ValueError(
                f"data.seq_len {data_args.seq_len} must divide over "
                f"parallel.sp={n_sp}"
            )
        if model_args.backbone.dropout > 0:
            # a replicated dropout rng would draw the SAME local mask on
            # every shard — neither equal to the unsharded step nor
            # statistically equivalent; reject until the mask is sliced
            # from a global draw like the noise is
            raise ValueError(
                "parallel.sp with backbone.dropout > 0 is unsupported: "
                "per-shard dropout masks would be correlated"
            )
        # every shard must span the conv receptive radii (ffn radius + the
        # 2-frame u-head halo), or halo exchange degenerates
        min_shard = max(2, model_args.backbone.radius)
        if data_args.seq_len // n_sp < min_shard:
            raise ValueError(
                f"seq_len/sp = {data_args.seq_len // n_sp} frames per shard "
                f"is below the {min_shard}-frame conv radius; lower "
                "parallel.sp"
            )
        sp_model = DiffusionModel(
            _replace(
                model_args, backbone=_replace(model_args.backbone, seq_axis=par.sp_axis)
            )
        )
        train_step = make_sp_train_step(
            sp_model, make_optimizer(train_args.opt), train_args, par.mesh
        )

    # multi-host: truncate every host's epoch to the same step count so the
    # collectives stay in lockstep (ragged input shards would drift/hang)
    lockstep = par.lockstep_steps(count_latent_windows(
        train_sets, data_args.seq_len, data_args.max_per_map, shard=par.input_shard,
    )) if par.process_count > 1 else None

    def train_stream(epoch: int) -> Iterator[LatentBatch]:
        stream = latent_windows(
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
            batch = LatentBatch(*(jnp.asarray(x) for x in b))
            yield par.shard_batch(batch)

    val_seg = data_args.seq_len
    vb = train_args.val_batches

    @jax.jit
    def val_loss(params, batch: LatentBatch, rng):
        _, aux = diffusion_loss(model, params, rng, batch, train_args, train=False)
        return aux

    def validate(state: TrainState) -> dict[str, float]:
        key = jax.random.PRNGKey(0)
        totals: dict[str, float] = {}
        n = 0
        for sample in latent_windows(val_sets, None):
            l = sample.z.shape[0]
            seg = l // vb
            if seg == 0:
                continue
            # equal segments of one full map as a batch (EMA weights)
            take = vb * seg
            h = sample.h[:take].reshape(vb, seg, -1)
            z = sample.z[:take].reshape(vb, seg, -1)
            # pad segments to the training window so val reuses one compile
            if seg < val_seg:
                pad = val_seg - seg
                h = np.pad(h, ((0, 0), (0, pad), (0, 0)), mode="edge")
                z = np.pad(z, ((0, 0), (0, pad), (0, 0)), mode="edge")
            else:
                h, z = h[:, :val_seg], z[:, :val_seg]
            batch = LatentBatch(
                h=jnp.asarray(h),
                z=jnp.asarray(z),
                s=jnp.asarray(np.broadcast_to(sample.s, (vb, *sample.s.shape))),
                labels=jnp.asarray(np.broadcast_to(sample.labels, (vb, *sample.labels.shape))),
            )
            key, k = jax.random.split(key)
            aux = val_loss(state.ema_params, batch, k)
            for name, v in aux.items():
                totals[name] = totals.get(name, 0.0) + float(v)
            n += 1
        if n == 0:
            return {}
        return {f"val/{k}": v / n for k, v in totals.items()}

    stage = Stage(
        name="denoiser",
        hparams={"model": cfg.get("model", {}), "train": cfg.get("train", {})},
        state=state,
        train_step=train_step,
        train_stream=train_stream,
        validate=validate,
        prepare_state=par.prepare_state,
        lr_schedule=lambda step: lr_at(step, train_args.opt.lr, train_args.opt.schedule),
    )
    return fit(stage, fit_args, resume_from)

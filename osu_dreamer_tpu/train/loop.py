"""Generic fit loop: epochs of jitted steps + validation + checkpoints.

Replaces the reference's Lightning ``Trainer.fit`` plumbing: per-step
logging (train/ prefix), per-epoch validation (val/, eval/ prefixes),
best-by-metric checkpointing with rolling ``last`` for resume, early
stopping, and TensorBoard scalars — driven by plain callables so each stage
stays a pure function of its TrainState.
"""

from __future__ import annotations

import time
from contextlib import nullcontext
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Iterable, Optional

import jax

from .checkpoint import BestCheckpointKeeper, read_progress, restore_train_state
from .logging import MetricsLogger
from .profiling import StepTimer, device_trace
from .state import TrainState


@dataclass
class FitArgs:
    run_dir: str = "runs/run"
    max_epochs: int = -1          # -1: run until early stopping / interrupt
    max_steps: int = -1
    log_every: int = 10
    monitor: str = "val/loss"
    monitor_mode: str = "min"
    early_stop_patience: int = 0  # 0: disabled
    early_stop_min_delta: float = 0.0
    # run validation/best-checkpointing every N epochs (the final epoch
    # always validates); early stopping counts only validated epochs
    val_every: int = 1
    # capture a jax.profiler device trace of this epoch into
    # <run_dir>/trace (view in TensorBoard's profile plugin / Perfetto);
    # -1 = off. Pick a steady-state epoch (0 is compile-heavy)
    trace_epoch: int = -1
    # refresh the rolling `last` checkpoint at most this often (a full save
    # fetches the whole TrainState off-device); a new best always saves
    save_last_every_s: float = 60.0
    seed: int = 0


@dataclass
class Stage:
    """everything the loop needs to train one model stage"""

    name: str
    hparams: dict[str, Any]
    state: TrainState
    train_step: Callable[[TrainState, Any], tuple[TrainState, dict]]
    train_stream: Callable[[int], Iterable]   # epoch -> batch iterable
    validate: Optional[Callable[[TrainState], dict[str, float]]] = None
    # (state, step, logger) -> None; e.g. validation figures
    on_validation: Optional[Callable[[TrainState, int, MetricsLogger], None]] = None
    # applied to the state after a possible checkpoint restore, before the
    # first step — e.g. replicating over a data-parallel mesh (restored
    # arrays land on one device; replication must happen after)
    prepare_state: Optional[Callable[[TrainState], TrainState]] = None
    # step -> learning rate (host-side, e.g. nn.schedule.lr_at) for the
    # TensorBoard train/lr track
    lr_schedule: Optional[Callable[[int], float]] = None


def fit(stage: Stage, args: FitArgs, resume_from: Optional[str] = None) -> TrainState:
    run_dir = Path(args.run_dir)
    # multi-host: only process 0 writes checkpoints/TB (concurrent saves to
    # a shared run_dir race); the others still TRACK best-metric so early
    # stopping stays in lockstep (val metrics match on replicated state)
    is_writer = jax.process_index() == 0
    logger = MetricsLogger(run_dir / "tb", write=is_writer)
    keeper = BestCheckpointKeeper(
        run_dir, args.monitor, args.monitor_mode, args.save_last_every_s,
        write=is_writer,
    )

    state = stage.state
    start_epoch = skip_batches = 0
    if resume_from:
        state = restore_train_state(resume_from, state)
        # exact resume: restart in the epoch the checkpoint was taken in and
        # skip the batches already consumed — streams are deterministic per
        # epoch (seeded seed + epoch), so together with the restored rng /
        # optimizer / EMA state the continued run reproduces the
        # uninterrupted run step for step (tests/test_train_infra.py)
        prog = read_progress(resume_from)
        start_epoch = int(prog.get("epoch", 0))
        skip_batches = int(prog.get("batch_in_epoch", 0))
        print(
            f"resumed from {resume_from} at step {int(state.step)}"
            + (f" (epoch {start_epoch}, {skip_batches} batches in)"
               if prog else "")
        )
    if stage.prepare_state is not None:
        state = stage.prepare_state(state)

    best = keeper.best_metric
    stale_epochs = 0
    epoch = start_epoch
    stop = False
    timer = StepTimer()
    # the stream position a restart must resume from if interrupted NOW
    progress = {"epoch": epoch, "batch_in_epoch": skip_batches}

    try:
        while not stop and (args.max_epochs < 0 or epoch < args.max_epochs):
            epoch_t0 = time.time()
            n_batches = skip_batches
            progress = {"epoch": epoch, "batch_in_epoch": n_batches}
            trace_ctx = (
                device_trace(run_dir / "trace")
                if epoch == args.trace_epoch
                else nullcontext()
            )
            with trace_ctx:
                stream = stage.train_stream(epoch)
                if skip_batches:
                    import itertools

                    stream = itertools.islice(stream, skip_batches, None)
                    skip_batches = 0
                stream_it = iter(stream)
                epoch_complete = True
                for batch in stream_it:
                    # progress must advance in lockstep with `state`: the
                    # step donates the old state's buffers, so an interrupt
                    # can only ever checkpoint the NEW state — pair it with
                    # the new batch count immediately (anything between the
                    # two would widen the window where a mid-epoch interrupt
                    # saves new-state/old-count and re-trains one batch)
                    state, metrics = stage.train_step(state, batch)
                    n_batches += 1
                    progress["batch_in_epoch"] = n_batches
                    timer.tick()
                    step = int(state.step)
                    if step % args.log_every == 0:
                        scalars = {k: v for k, v in metrics.items()}
                        if stage.lr_schedule is not None:
                            # the update that produced `step` evaluated the
                            # schedule at the PRE-update count
                            scalars["lr"] = stage.lr_schedule(step - 1)
                        logger.scalars(scalars, step, prefix="train/")
                        if timer.steps_per_sec > 0:
                            logger.scalars({"steps_per_sec": timer.steps_per_sec}, step, prefix="perf/")
                    if args.max_steps > 0 and step >= args.max_steps:
                        stop = True
                        # a stop that lands exactly on the epoch's final
                        # batch DID complete the epoch: peek one batch to
                        # tell (recording mid-epoch here would make a resume
                        # replay an empty epoch and re-validate identical
                        # state, double-counting it toward early stopping).
                        # The peeked batch is dropped — a resume regenerates
                        # the deterministic per-epoch stream
                        _sent = object()
                        epoch_complete = next(stream_it, _sent) is _sent
                        break
                if epoch == args.trace_epoch:
                    # the trace must cover real device work: block before exit
                    jax.block_until_ready(state.params)

            if n_batches == 0:
                raise RuntimeError(
                    "training stream yielded no batches — most often the "
                    "dataset has fewer windows than data.batch_size (partial "
                    "batches are dropped for stable jit shapes); lower "
                    "batch_size or raise max_per_map"
                )

            # --- validation + checkpointing ---
            # validation (a full sweep of the val set + metric jits) can
            # dwarf short epochs; val_every thins it, the final epoch always
            # validates so `best` reflects the finished run
            is_final = (args.max_epochs >= 0 and epoch == args.max_epochs - 1) or stop
            run_val = (epoch + 1) % max(1, args.val_every) == 0 or is_final
            val_metrics: dict[str, float] = {}
            if run_val and stage.validate is not None:
                val_metrics = stage.validate(state)
                logger.scalars(val_metrics, int(state.step))
            if run_val and stage.on_validation is not None:
                stage.on_validation(state, int(state.step), logger)

            # state after a COMPLETED epoch e == state before epoch e+1: a
            # restart from this checkpoint begins cleanly at the next epoch.
            # A max_steps stop mid-epoch keeps the accurate mid-epoch
            # position instead — resuming with a higher max_steps must
            # continue with this epoch's remaining batches, not skip them
            if epoch_complete:
                progress = {"epoch": epoch + 1, "batch_in_epoch": 0}
            improved = keeper.update(state, stage.hparams, val_metrics, progress)
            logger.flush()
            dt = time.time() - epoch_t0
            print(
                f"[{stage.name}] epoch {epoch}: {n_batches} steps in {dt:.1f}s"
                + (f" | {args.monitor}={val_metrics.get(args.monitor):.5f}" if args.monitor in val_metrics else "")
                + (" *best*" if improved else "")
            )

            # --- early stopping ---
            if args.early_stop_patience > 0 and args.monitor in val_metrics:
                value = val_metrics[args.monitor]
                better = (
                    best is None
                    or (args.monitor_mode == "min" and value < best - args.early_stop_min_delta)
                    or (args.monitor_mode == "max" and value > best + args.early_stop_min_delta)
                )
                if better:
                    best = value
                    stale_epochs = 0
                else:
                    stale_epochs += 1
                    if stale_epochs >= args.early_stop_patience:
                        print(f"[{stage.name}] early stop: {args.monitor} stale for {stale_epochs} epochs")
                        stop = True

            epoch += 1
    except KeyboardInterrupt:
        print(f"[{stage.name}] interrupted at step {int(state.step)}; last checkpoint kept")
    finally:
        # the rolling save is rate-limited; always leave a current `last`
        # (with the exact stream position, so a mid-epoch interrupt resumes
        # step-for-step)
        keeper.min_save_interval_s = 0.0
        keeper.update(state, stage.hparams, {}, progress)
        logger.close()

    return state

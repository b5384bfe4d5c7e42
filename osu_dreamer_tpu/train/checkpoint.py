"""Orbax checkpointing with best-by-metric + resume semantics.

Parity with the reference's Lightning checkpointing (SURVEY.md §5):
``ModelCheckpoint(save_top_k=1, monitor=<metric>)`` + ``--ckpt-path`` resume
(latent/model.yml:16-21, fit_latent.py:32). A checkpoint directory holds the
full TrainState (params, optimizer, EMA, loss-EMA, rng, step) plus a JSON
sidecar with hyperparameters and the monitored metric, so export-inference
can rebuild models without the training config files.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState

_STATE_DIR = "state"
_META_FILE = "meta.json"


def _local_checkpointer() -> ocp.StandardCheckpointer:
    """a StandardCheckpointer whose barrier covers ONLY this process.

    Checkpoints here are host-local by design: the state is device_get to
    host numpy before saving, and in multi-host runs only process 0 writes
    (BestCheckpointKeeper write=is_writer). Orbax's default save/restore is
    a COLLECTIVE with a global barrier — a single-writer save under
    jax.distributed deadlocks the cluster (found by
    tests/test_parallel.py::test_multihost_kill_resume_equality: process 0
    hung in Checkpointer:save_start waiting for peers that never save)."""
    me = jax.process_index()
    opts = ocp.options.MultiprocessingOptions(
        primary_host=me,
        active_processes={me},
        barrier_sync_key_prefix=f"proc{me}",
    )
    return ocp.StandardCheckpointer(multiprocessing_options=opts)


@dataclass
class LoadedCheckpoint:
    params: Any
    ema_params: Optional[Any]
    step: int
    hparams: dict[str, Any]
    metric: Optional[float]


def save_train_checkpoint(
    path: str | Path,
    state: TrainState,
    hparams: dict[str, Any],
    metric: Optional[float] = None,
    progress: Optional[dict[str, int]] = None,
) -> None:
    """write a full training checkpoint (overwrites `path`).

    Crash-safe: the new checkpoint is fully written to a sibling .tmp dir
    first and swapped in with renames, so an interrupt mid-save never
    destroys the previous resume point (a kill between the two renames —
    microseconds — leaves the complete .tmp next to the old dir)."""
    path = Path(path).absolute()
    tmp = path.with_name(path.name + ".tmp")
    old = path.with_name(path.name + ".old")
    for stale in (tmp, old):
        if stale.exists():
            shutil.rmtree(stale)
    tmp.mkdir(parents=True)

    host_state = jax.tree.map(np.asarray, jax.device_get(state))
    with _local_checkpointer() as ckptr:
        ckptr.save(tmp / _STATE_DIR, host_state)

    meta = {"hparams": hparams, "metric": metric, "step": int(state.step)}
    if progress is not None:
        # data-stream position for EXACT resume: the epoch to restart in and
        # how many batches of stage.train_stream(epoch) were already consumed
        # (streams are deterministic per epoch: seeded with seed + epoch)
        meta["progress"] = progress
    (tmp / _META_FILE).write_text(json.dumps(meta))

    if path.exists():
        path.rename(old)
    tmp.rename(path)
    if old.exists():
        shutil.rmtree(old)


# ------------------------------------------------- param-path migration --
# Historical module renames (old flax auto-name -> current), applied on
# restore when the stored tree does not match the template. A key is only
# renamed when it is MISSING from the template at that tree position and its
# renamed form exists there — a legitimate current-model `Conv_i` that
# coexists with a `DepthwiseConv_i` is never touched.
PARAM_PATH_RENAMES: dict[str, str] = {
    # u-head tap-sum swap: nn.Conv -> DepthwiseConv under flax auto-naming
    # (models/diffusion/model.py:163-169); shapes are value-compatible
    "Conv_0": "DepthwiseConv_0",
    "Conv_1": "DepthwiseConv_1",
}


def migrate_param_paths(tree: Any, renames: Optional[dict[str, str]] = None) -> Any:
    """rename dict keys anywhere in a pytree per the rename table, rebuilding
    containers (dicts, lists, (named)tuples, dataclass nodes) in place.
    Leaves pass through untouched."""
    import dataclasses

    table = PARAM_PATH_RENAMES if renames is None else renames
    node = tree
    if isinstance(node, dict):
        return {table.get(k, k): migrate_param_paths(v, table) for k, v in node.items()}
    if isinstance(node, tuple) and hasattr(node, "_fields"):  # namedtuple
        return type(node)(*(migrate_param_paths(v, table) for v in node))
    if isinstance(node, (list, tuple)):
        return type(node)(migrate_param_paths(v, table) for v in node)
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        return node.replace(**{
            f.name: migrate_param_paths(getattr(node, f.name), table)
            for f in dataclasses.fields(node)
        })
    return node


def restore_train_state(path: str | Path, template: TrainState) -> TrainState:
    """restore a TrainState for resuming training; `template` supplies the
    pytree structure (abstract shapes are inferred from it).

    Checkpoints written before a module rename restore through
    ``PARAM_PATH_RENAMES``: on a structure mismatch the restore is retried
    against a target whose keys carry the OLD names (inverse table), and the
    restored tree is renamed forward into the current model's paths."""
    path = Path(path).absolute()
    host_template = jax.device_get(template)
    with _local_checkpointer() as ckptr:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, host_template)
        try:
            return ckptr.restore(path / _STATE_DIR, target)
        except Exception:
            inverse = {v: k for k, v in PARAM_PATH_RENAMES.items()}
            old_target = migrate_param_paths(target, inverse)
            restored = ckptr.restore(path / _STATE_DIR, old_target)
            print(f"restored {path} through the param-path rename table")
            return migrate_param_paths(restored, PARAM_PATH_RENAMES)


def read_progress(path: str | Path) -> dict[str, int]:
    """data-stream position stored with a checkpoint (empty for checkpoints
    written before progress tracking, or saved without it)"""
    meta_file = Path(path).absolute() / _META_FILE
    if not meta_file.exists():
        return {}
    return json.loads(meta_file.read_text()).get("progress") or {}


def load_train_checkpoint(path: str | Path) -> LoadedCheckpoint:
    """load params/EMA/hparams without needing the full state template
    (used by encode-latents and export-inference)"""
    path = Path(path).absolute()
    meta = json.loads((path / _META_FILE).read_text())

    with _local_checkpointer() as ckptr:
        raw = ckptr.restore(path / _STATE_DIR)

    return LoadedCheckpoint(
        params=raw["params"],
        ema_params=raw.get("ema_params"),
        step=int(meta.get("step", 0)),
        hparams=meta["hparams"],
        metric=meta.get("metric"),
    )


class BestCheckpointKeeper:
    """keep the single best checkpoint by a monitored metric
    (Lightning ``ModelCheckpoint(save_top_k=1)`` semantics) plus a rolling
    ``last`` checkpoint for crash resume"""

    def __init__(
        self,
        run_dir: str | Path,
        monitor: str,
        mode: str = "min",
        min_save_interval_s: float = 0.0,
        write: bool = True,
    ):
        assert mode in ("min", "max")
        self.run_dir = Path(run_dir)
        self.monitor = monitor
        self.mode = mode
        # write=False: track best-metric/improvement (early stopping must
        # stay in LOCKSTEP across multi-host processes — val metrics are
        # identical on replicated state) but never touch disk. Non-zero
        # process ranks use this so concurrent saves cannot race.
        self.write = write
        # throttle rolling-`last` saves: a full checkpoint is a device->host
        # fetch of the whole TrainState (hundreds of MB), which can dwarf
        # short epochs; `last` is refreshed at most this often (a new best
        # always saves). 0 = save every update.
        self.min_save_interval_s = min_save_interval_s
        self._last_save_t: float = -float("inf")
        self.best_metric: Optional[float] = None
        # recover best metric from an existing run dir (resume)
        best_meta = self.run_dir / "best" / _META_FILE
        if best_meta.exists():
            self.best_metric = json.loads(best_meta.read_text()).get("metric")

    @property
    def best_path(self) -> Path:
        return self.run_dir / "best"

    @property
    def last_path(self) -> Path:
        return self.run_dir / "last"

    def update(
        self,
        state: TrainState,
        hparams: dict[str, Any],
        metrics: dict[str, float],
        progress: Optional[dict[str, int]] = None,
    ) -> bool:
        """save `last` (rate-limited); promote to `best` when the monitored
        metric improves (always saved). returns True when a new best was
        saved"""
        import time

        value = metrics.get(self.monitor)
        improved = value is not None and (
            self.best_metric is None
            or (self.mode == "min" and value < self.best_metric)
            or (self.mode == "max" and value > self.best_metric)
        )
        if not self.write:
            if improved:
                self.best_metric = value
            return improved
        now = time.monotonic()
        if not improved and now - self._last_save_t < self.min_save_interval_s:
            return False

        save_train_checkpoint(self.last_path, state, hparams, value, progress)
        self._last_save_t = now

        if improved:
            self.best_metric = value
            if self.best_path.exists():
                shutil.rmtree(self.best_path)
            # hardlink instead of copying (checkpoints are hundreds of MB);
            # safe because saves never mutate in place — save_train_checkpoint
            # rmtree+rewrites, which unlinks
            try:
                shutil.copytree(self.last_path, self.best_path, copy_function=os.link)
            except OSError:  # cross-device fallback
                shutil.copytree(self.last_path, self.best_path)
        return improved

"""Map-generation service: load-once artifact, cross-request batching.

The deployment surface of the framework. The reference stops at a one-shot
CLI (reference scripts/predict.py); a production deployment needs a resident
process that owns the chip, amortizes compilation, and keeps the device busy
under concurrent load. This service:

- loads the inference artifact once and pins params on device;
- runs ONE dispatcher thread that owns all device work (the TPU runtime is
  happiest with a single submitting thread, and it serializes access to the
  chip the way bulk predict's loop does);
- batches concurrent requests that share a compiled-program signature
  (length bucket, #difficulties, steps, guidance) through the same fused
  featurizer+sampler program the predict CLI uses — per-song difficulty
  labels ride the LDM's (S, D, NUM_LABELS) path so batched requests keep
  their own conditioning;
- pads each batch to the next power of two (max ``max_batch``) so at most
  log2(max_batch)+1 program sizes exist per signature — a fresh XLA compile
  costs seconds-to-minutes, a padded row costs microseconds;
- on multi-chip hosts, shards each dispatch's song axis over a 1-D data
  mesh (the same machinery as bulk ``predict --batch-songs``): params
  replicate once, every dispatch pads to a multiple of the mesh size, and
  rows run on separate chips — so even a solo request returns in one-row
  time while the batch capacity scales with the chip count;
- submits device programs WITHOUT synchronizing (jax dispatch is async) and
  hands each waiter a device-array slice; the device->host fetch AND the
  CPU tail (.osu decode, .osz zip) run on the REQUEST thread, so batch N+1's
  compute overlaps batch N's result transfer — on a tunneled chip the fetch
  is comparable to the compute and serializing them halves throughput.

Requests with an explicit seed are never co-batched: the sampler draws one
noise tensor per batch, so reproducibility requires a deterministic batch
composition — a seeded request runs solo (padded), unseeded requests share
server-generated keys.
"""

from __future__ import annotations

import io
import os
import tempfile
import threading
import time
import zipfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional, Sequence

import numpy as np

DEFAULT_DIFF = (5.0, 9.0, 8.0, 4.0, 6.0)
# per-request work bounds for a resident multi-tenant service
MAX_SAMPLE_STEPS = 512
MAX_DIFFS = 16
_AUDIO_SUFFIXES = frozenset({".wav", ".mp3", ".ogg", ".opus", ".m4a", ".flac"})


def _safe_entry_name(name: str) -> str:
    """user-supplied audio filename -> a safe zip-entry / tempfile name:
    basename only (zip-slip), printable chars, known audio suffix"""
    base = Path(str(name or "").replace("\\", "/")).name
    base = "".join(c for c in base if c.isprintable() and c not in ':"')
    stem, suffix = Path(base).stem, Path(base).suffix.lower()
    if not stem or stem in (".", ".."):
        stem = "audio"
    if suffix not in _AUDIO_SUFFIXES:
        suffix = ".wav"
    return stem + suffix


@dataclass
class _Pending:
    """one request's device-side work unit"""

    buf: np.ndarray          # int16 bucket-padded wave
    real_frames: int
    n_frames: int
    out_frames: int
    L: int                   # true frame count (crop length)
    labels: np.ndarray       # (D, 5) float32
    steps: int
    guidance: float
    seed: Optional[int]
    done: threading.Event = field(default_factory=threading.Event)
    # device-array slices of the batch outputs, set at dispatch; the REQUEST
    # thread materializes them (device->host) so the dispatcher never blocks
    # on the relay link and batch N+1's program overlaps batch N's fetch.
    # chart slices arrive in the sampler's quantized transfer format
    # ((D, Lp, 7) uint8, (D, Lp, 2) int16) — dequantize_chart reassembles
    chart: Optional[Any] = None               # (hit_u8, xy_i16) on completion
    pred_labels: Optional[Any] = None         # (D, 5)
    error: Optional[BaseException] = None
    enqueued_at: float = field(default_factory=time.monotonic)

    @property
    def signature(self) -> tuple:
        return (
            self.n_frames, self.out_frames, len(self.labels),
            self.steps, self.guidance,
        )


class GeneratorService:
    """resident generation service over one inference artifact.

    ``generate`` is thread-safe and blocking: call it from as many request
    threads as you like; the dispatcher batches compatible requests.
    """

    def __init__(
        self,
        model_path: str | Path,
        *,
        max_batch: int = 4,
        batch_window_ms: float = 25.0,
        infer_tempo: bool = False,
        snap_divisor: int = 0,
        devices: Optional[int] = None,
        serialize_workers: Optional[int] = None,
    ):
        import jax

        from osu_dreamer_tpu.models.inference import load_inference

        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._jax = jax
        self.model, params = load_inference(model_path)
        self.chunk = self.model.args.latent.chunk_size
        self.max_batch = max_batch
        self.batch_window = batch_window_ms / 1000.0
        self.infer_tempo = infer_tempo
        self.snap_divisor = int(snap_divisor)

        # .osu decode pool: the per-request host tail (peak-pick + slider
        # MAP fit) is GIL-bound — on a multi-core host it must fan out over
        # processes or the service tops out at ~1 core of decode regardless
        # of chip headroom. Default: one worker per core up to 4; 1 core ->
        # no pool (spawn overhead with no parallelism to gain)
        if serialize_workers is None:
            serialize_workers = min(4, os.cpu_count() or 1)
        self._pool = None
        if serialize_workers > 1:
            from osu_dreamer_tpu.utils.procpool import spawn_serialize_pool

            self._pool = spawn_serialize_pool(serialize_workers)
        self.serialize_workers = serialize_workers if self._pool else 1

        # multi-device serving: shard the song axis of every dispatch over a
        # 1-D data mesh (the same machinery as bulk predict --batch-songs).
        # Every dispatch pads to a multiple of the mesh size — rows run on
        # separate chips, so the padding costs idle-row energy, not latency
        # (a solo request on an 8-chip host still returns in ~one-row time).
        devs = jax.local_devices()
        n_dev = len(devs) if devices is None else max(1, min(devices, len(devs)))
        n_dev = min(n_dev, max_batch)
        self._song_sharding = None
        self._mesh = None
        if n_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            from osu_dreamer_tpu.parallel import data_parallel_mesh, replicate

            self.max_batch = -(-max_batch // n_dev) * n_dev
            mesh = data_parallel_mesh(devs[:n_dev])
            self.params = replicate(params, mesh)
            self._song_sharding = NamedSharding(mesh, PartitionSpec("data"))
            self._mesh = mesh
        else:
            # pin host numpy params on device ONCE (passed raw to a jitted
            # call they would re-upload the artifact every dispatch)
            self.params = jax.device_put(params)
        self.n_devices = n_dev

        self._sample = self._build_sampler()

        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._pending: list[_Pending] = []
        self._closed = False
        self._key_counter = int.from_bytes(os.urandom(4), "big")

        # observability
        self.stats_lock = threading.Lock()
        self.stats = {
            "requests": 0,
            "batches": 0,
            "batched_rows": 0,        # real (non-padding) rows dispatched
            "padded_rows": 0,
            "errors": 0,
            "compiled_signatures": 0,
            "started_at": time.time(),
        }
        self._seen_programs: set[tuple] = set()

        self._dispatcher = threading.Thread(
            target=self._run, name="osu-dreamer-dispatcher", daemon=True
        )
        self._dispatcher.start()

    # ------------------------------------------------------------- device --

    def _build_sampler(self):
        # the shared fused featurizer+sampler program (one dispatch per
        # batch; shard_map over the data mesh on multi-chip hosts) — the
        # same builder bulk predict uses, so the two surfaces cannot
        # diverge. Labels shard with the songs: each co-batched request
        # brings its own diff rows.
        from osu_dreamer_tpu.models.inference.sampler import build_batch_sampler

        mesh = self._mesh if self._song_sharding is not None else None
        return build_batch_sampler(self.model, mesh, labels_sharded=True)

    def _next_key(self, seed: Optional[int]):
        import jax

        if seed is not None:
            return jax.random.PRNGKey(seed)
        with self._lock:
            self._key_counter += 1
            return jax.random.PRNGKey(self._key_counter % (2**31))

    # --------------------------------------------------------- dispatcher --

    def _take_batch(self) -> Optional[list[_Pending]]:
        """block for the first request, then widen within the batch window"""
        with self._cond:
            while not self._pending and not self._closed:
                self._cond.wait(timeout=0.1)
            if self._closed and not self._pending:
                return None
            first = self._pending.pop(0)

        batch = [first]
        if first.seed is not None or self.max_batch == 1:
            return batch  # seeded requests run solo (reproducibility)

        deadline = time.monotonic() + self.batch_window
        sig = first.signature
        while len(batch) < self.max_batch:
            with self._cond:
                i = 0
                while i < len(self._pending) and len(batch) < self.max_batch:
                    r = self._pending[i]
                    if r.seed is None and r.signature == sig:
                        batch.append(self._pending.pop(i))
                    else:
                        i += 1
            remaining = deadline - time.monotonic()
            if len(batch) >= self.max_batch or remaining <= 0:
                break
            with self._cond:
                self._cond.wait(timeout=min(remaining, 0.005))
        return batch

    def _run(self) -> None:
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            try:
                self._dispatch(batch)
            except BaseException as e:  # noqa: BLE001 — failures go to waiters
                for r in batch:
                    r.error = e
                    r.done.set()
                with self.stats_lock:
                    self.stats["errors"] += len(batch)

    def _dispatch(self, batch: list[_Pending]) -> None:
        import jax.numpy as jnp

        # pad the song axis to the next power of two (bounded program count),
        # then to a multiple of the data mesh so sharded dispatches divide
        S = 1
        while S < len(batch):
            S *= 2
        S = min(S, self.max_batch)
        S = -(-S // self.n_devices) * self.n_devices
        rows = list(batch) + [batch[-1]] * (S - len(batch))

        waves_np = np.stack([r.buf for r in rows])
        rfs_np = np.asarray([r.real_frames for r in rows], np.int32)
        labels_np = np.stack([r.labels for r in rows]).astype(np.float32)
        if self._song_sharding is not None:
            import jax

            waves = jax.device_put(waves_np, self._song_sharding)
            rfs = jax.device_put(rfs_np, self._song_sharding)
            labels = jax.device_put(labels_np, self._song_sharding)
        else:
            waves = jnp.asarray(waves_np)
            rfs = jnp.asarray(rfs_np)
            labels = jnp.asarray(labels_np)  # (S, D, 5) — per-song conditioning
        first = batch[0]
        key = self._next_key(first.seed)

        program = (S,) + first.signature
        fresh = program not in self._seen_programs
        self._seen_programs.add(program)

        hit_q, xy_q, pred_labels = self._sample(
            self.params, waves, rfs, labels, key,
            first.n_frames, first.out_frames, first.steps, first.guidance,
        )
        # hand each waiter its device-array slice WITHOUT synchronizing: jax
        # dispatch is async, so the dispatcher is free to submit the next
        # batch while this one computes and while request threads pull their
        # results over the host link (the fetch is the expensive part on a
        # tunneled chip — serializing it behind compute halved throughput).
        # Start the host copies now so the transfer overlaps the next batch
        for a in (hit_q, xy_q, pred_labels):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        D = len(first.labels)
        for i, r in enumerate(batch):
            r.chart = (hit_q[i * D : (i + 1) * D], xy_q[i * D : (i + 1) * D])
            r.pred_labels = pred_labels[i * D : (i + 1) * D]
            r.done.set()

        with self.stats_lock:
            self.stats["batches"] += 1
            self.stats["batched_rows"] += len(batch)
            self.stats["padded_rows"] += S - len(batch)
            if fresh:
                self.stats["compiled_signatures"] += 1

    # ------------------------------------------------------------ request --

    def generate(
        self,
        audio_bytes: bytes,
        *,
        audio_name: str = "audio.wav",
        diffs: Optional[Sequence[Sequence[float]]] = None,
        sample_steps: int = 8,
        style_guidance: float = 1.0,
        seed: Optional[int] = None,
        title: Optional[str] = None,
        artist: Optional[str] = None,
        timeout: Optional[float] = 600.0,
        infer_tempo: Optional[bool] = None,
        snap_divisor: Optional[int] = None,
    ) -> tuple[str, bytes]:
        """generate one mapset -> (suggested .osz filename, zip bytes).

        Blocking; safe to call from many threads. ``diffs`` is a list of
        (sr, ar, od, cs, hp) rows — one .osu per row. ``infer_tempo`` /
        ``snap_divisor`` override the service-level defaults per request
        (None = use the default); they only affect the host-side decode, so
        requests with different values still co-batch on device.
        """
        from osu_dreamer_tpu.audio import HOP_LEN, load_wave, prep_wave_for_model
        from osu_dreamer_tpu.signal.serialize import decode_osu_entry

        if self._closed:
            raise RuntimeError("service is closed")
        diff_rows = np.asarray(
            diffs if diffs is not None and len(diffs) else [DEFAULT_DIFF],
            np.float32,
        )
        if diff_rows.ndim != 2 or diff_rows.shape[1] != 5:
            raise ValueError("each diff row must be (sr, ar, od, cs, hp)")
        if len(diff_rows) > MAX_DIFFS or not np.isfinite(diff_rows).all():
            raise ValueError(f"at most {MAX_DIFFS} finite diff rows per request")
        if snap_divisor is not None and snap_divisor < 0:
            raise ValueError("snap_divisor must be >= 0")
        # a resident service must bound per-request device work: steps and
        # guidance are jit STATIC args — every distinct value compiles a new
        # program, and a huge step count would wedge the single dispatcher
        if not 1 <= int(sample_steps) <= MAX_SAMPLE_STEPS:
            raise ValueError(f"sample_steps must be in [1, {MAX_SAMPLE_STEPS}]")
        if not np.isfinite(style_guidance) or not 0.0 <= float(style_guidance) <= 50.0:
            raise ValueError("style_guidance must be a finite value in [0, 50]")

        # host prep on the request thread (decode may need a real file path
        # for the container demuxer)
        audio_name = _safe_entry_name(audio_name)
        suffix = Path(audio_name).suffix or ".wav"
        with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as tf:
            tf.write(audio_bytes)
            tmp = Path(tf.name)
        try:
            wave = load_wave(tmp)
        finally:
            tmp.unlink(missing_ok=True)
        buf, real_frames, n_frames, out_frames = prep_wave_for_model(
            wave, self.chunk
        )
        L = max(1, -(-len(wave) // HOP_LEN))

        req = _Pending(
            buf=buf, real_frames=real_frames, n_frames=n_frames,
            out_frames=out_frames, L=L, labels=diff_rows,
            steps=int(sample_steps), guidance=float(style_guidance), seed=seed,
        )
        # enqueue under the lock WITH the closed re-check: a request that
        # slips in after close() would otherwise never be dispatched and
        # hang for the full timeout
        with self._cond:
            if self._closed:
                raise RuntimeError("service is closed")
            self._pending.append(req)
            self._cond.notify_all()
        with self.stats_lock:
            self.stats["requests"] += 1

        if not req.done.wait(timeout=timeout):
            with self._cond:
                if req in self._pending:  # never dispatched: withdraw
                    self._pending.remove(req)
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise RuntimeError("generation failed") from req.error

        # device->host fetch + CPU tail on the request thread (deferred
        # device errors surface here, not in the dispatcher)
        try:
            from osu_dreamer_tpu.models.inference.sampler import dequantize_chart

            chart = dequantize_chart(*req.chart)
            pred_labels = np.asarray(req.pred_labels, np.float32)
        except Exception as e:
            with self.stats_lock:
                self.stats["errors"] += 1
            raise RuntimeError("generation failed on device") from e
        title = title or Path(audio_name).stem
        artist = artist or "Unknown Artist"
        signals = chart[:, : req.L].transpose(0, 2, 1)  # (D, X, L)
        it = self.infer_tempo if infer_tempo is None else infer_tempo
        sd = self.snap_divisor if snap_divisor is None else snap_divisor
        jobs = [
            (title, artist, audio_name, i, row, sig)
            for i, (row, sig) in enumerate(zip(pred_labels, signals))
        ]
        if self._pool is not None:
            # fan the per-diff decode over the pool: requests share it, so a
            # multi-core host scales decode across concurrent requests too
            rs = [
                self._pool.apply_async(
                    decode_osu_entry, j,
                    {"infer_tempo": it, "snap_divisor": sd},
                )
                for j in jobs
            ]
            entries = [r.get() for r in rs]
        else:
            entries = [
                decode_osu_entry(*j, infer_tempo=it, snap_divisor=sd)
                for j in jobs
            ]

        out = io.BytesIO()
        with zipfile.ZipFile(out, "w") as z:
            z.writestr(audio_name, audio_bytes)
            for name, text in entries:
                z.writestr(name, text)
        return f"{artist} - {title}.osz", out.getvalue()

    # ------------------------------------------------------------- admin ---

    def health(self) -> dict[str, Any]:
        return {
            "ok": not self._closed,
            "backend": self._jax.default_backend(),
            "devices": self.n_devices,
            "devices_visible": len(self._jax.local_devices()),
            "chunk": self.chunk,
            "max_batch": self.max_batch,
            "serialize_workers": self.serialize_workers,
            "uptime_s": round(time.time() - self.stats["started_at"], 1),
        }

    def snapshot_stats(self) -> dict[str, Any]:
        with self.stats_lock:
            out = dict(self.stats)
        with self._cond:
            out["queued"] = len(self._pending)
        return out

    def close(self, timeout: float = 5.0) -> None:
        with self._cond:
            self._closed = True
            stranded = list(self._pending)
            self._pending.clear()
            self._cond.notify_all()
        for r in stranded:  # fail waiters instead of letting them time out
            r.error = RuntimeError("service closed")
            r.done.set()
        self._dispatcher.join(timeout=timeout)
        if self._pool is not None:
            self._pool.close()
            self._pool.join()
            self._pool = None

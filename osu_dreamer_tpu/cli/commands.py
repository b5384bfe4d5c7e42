"""CLI command implementations.

Capability parity with reference scripts/ (SURVEY.md §2.11): the same seven
commands with the same flags and on-disk layouts. Heavy imports are deferred
into the command bodies so `--help` stays instant.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Optional

import click

file_opt = click.Path(exists=True, dir_okay=False, path_type=Path)
dir_opt = click.Path(file_okay=False, path_type=Path)


# ------------------------------------------------------------ generate-data --


@click.command("generate-data")
@click.option("--data-dir", type=dir_opt, default=Path("./data"), help="output directory for pre-processed training samples")
@click.option("--num-workers", type=click.IntRange(min=1), default=2, help="host worker threads for beatmap parsing/encoding")
@click.option("--force", is_flag=True, help="overwrite existing pre-processed maps")
@click.option("--songs-dir", type=click.Path(exists=True, file_okay=False, path_type=Path), help="ingest a local library (.osz archives / osu! Songs folders) instead of streaming the HF corpus")
def generate_data(data_dir: Path, num_workers: int, force: bool, songs_dir: Optional[Path]):
    """generate the training dataset (streams the HF beatmap corpus, or a
    local mapset library with --songs-dir; spectrograms run on the
    accelerator, parsing on host workers)"""
    from tqdm import tqdm

    from osu_dreamer_tpu.data.ingest import build_dataset

    with tqdm(unit="sample") as pbar:
        for _written in build_dataset(data_dir, num_workers, force, songs_dir):
            pbar.update(1)


# ---------------------------------------------------------------- training --


def _config_option(stage: str):
    default = Path(__file__).parent.parent / "models" / stage / "config.yml"
    return click.option(
        "-c", "--config", type=file_opt, default=default, help="training config file"
    )


@click.command("fit-latent")
@_config_option("latent")
@click.option("--ckpt-path", type=click.Path(exists=True, path_type=Path), help="checkpoint to resume from")
def fit_latent(config: Path, ckpt_path: Optional[Path]):
    """train the stage-1 chart autoencoder"""
    from osu_dreamer_tpu.models.latent.fit import run

    run(config, str(ckpt_path) if ckpt_path else None)


@click.command("fit-denoiser")
@_config_option("diffusion")
@click.option("--ckpt-path", type=click.Path(exists=True, path_type=Path), help="checkpoint to resume from")
def fit_denoiser(config: Path, ckpt_path: Optional[Path]):
    """train the stage-2 latent denoiser"""
    from osu_dreamer_tpu.models.diffusion.fit import run

    run(config, str(ckpt_path) if ckpt_path else None)


@click.command("fit-style")
@_config_option("style")
@click.option("--ckpt-path", type=click.Path(exists=True, path_type=Path), help="checkpoint to resume from")
def fit_style(config: Path, ckpt_path: Optional[Path]):
    """train the stage-3 style prior"""
    from osu_dreamer_tpu.models.style.fit import run

    run(config, str(ckpt_path) if ckpt_path else None)


# ----------------------------------------------------------- encode-latents --


@click.command("encode-latents")
@click.option("--latent-ckpt-path", type=click.Path(exists=True, path_type=Path), default=Path("runs/latent/best"), help="latent checkpoint directory")
@click.option("--data-dir", type=click.Path(exists=True, file_okay=False, path_type=Path), default=Path("./data"), help="pre-processed dataset directory")
@click.option("--force", is_flag=True, help="overwrite existing cached latents")
def encode_latents(latent_ckpt_path: Path, data_dir: Path, force: bool):
    """precompute latent encodings (h, z, s, labels) for stages 2/3.

    caches per map: <id>.latent.npz (z, s, labels); per mapset: h.npy
    (audio features at latent rate). Maps are bucket-padded so the encoder
    compiles a handful of shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tqdm import tqdm

    from osu_dreamer_tpu.data import pad_to_multiple
    from osu_dreamer_tpu.models.latent import LatentModel, LatentModelArgs
    from osu_dreamer_tpu.signal import read_beatmap
    from osu_dreamer_tpu.train.checkpoint import load_train_checkpoint
    from osu_dreamer_tpu.utils import dataclass_from_dict

    ckpt = load_train_checkpoint(latent_ckpt_path)
    model_args = dataclass_from_dict(LatentModelArgs, ckpt.hparams["model"])
    model = LatentModel(model_args)
    params = ckpt.params
    chunk = model_args.chunk_size
    bucket = chunk * 64

    @jax.jit
    def encode_audio(spec_u8):
        # the disk format is uint8 — travel the host link quantized (4x
        # fewer bytes; uploads dominate dataset builds) and dequantize on
        # device, bit-identical to read_spec
        spec = spec_u8.astype(jnp.float32) / 255.0
        _, h = model.apply(params, spec, method=LatentModel.encode_audio)
        return h

    @jax.jit
    def encode_chart(chart):
        return model.apply(params, chart, method=LatentModel.encode_chart)

    map_files = sorted(data_dir.rglob("*.map.npy"))
    if not map_files:
        raise click.ClickException(f"no pre-processed maps found in {data_dir}")

    pending = None  # (out_file, z, s, labels, n_latent) — fetch overlaps next dispatch
    for map_file in tqdm(map_files, unit="map"):
        out_file = map_file.with_name(map_file.name.removesuffix(".map.npy") + ".latent.npz")
        h_file = map_file.parent / "h.npy"
        if not force and out_file.exists() and h_file.exists():
            continue

        if force or not h_file.exists():
            with open(map_file.parent / "spec.npy", "rb") as f:
                spec_u8 = np.load(f).T  # (L, A) uint8
            n_latent = -(-spec_u8.shape[0] // chunk)
            padded = pad_to_multiple(spec_u8, bucket)[None]
            h = np.asarray(encode_audio(jnp.asarray(padded))[0, :n_latent], np.float32)
            np.save(h_file, h)

        with open(map_file, "rb") as f:
            chart_cl, labels = read_beatmap(f)
        chart = chart_cl.T.astype(np.float32)  # (L, X)
        n_latent = -(-chart.shape[0] // chunk)
        padded = pad_to_multiple(chart, bucket)[None]
        z, s = encode_chart(jnp.asarray(padded))
        if pending is not None:
            _write_latents(*pending)
        pending = (out_file, z, s, labels, n_latent)
    if pending is not None:
        _write_latents(*pending)


def _write_latents(out_file, z, s, labels, n_latent) -> None:
    import numpy as np

    np.savez(
        out_file,
        z=np.asarray(z[0, :n_latent], np.float32),
        s=np.asarray(s[0], np.float32),
        labels=labels,
    )


# --------------------------------------------------------- export-inference --


@click.command("export-inference")
@click.option("--latent-ckpt-path", type=click.Path(exists=True, path_type=Path), default=Path("runs/latent/best"), help="latent checkpoint")
@click.option("--denoiser-ckpt-path", type=click.Path(exists=True, path_type=Path), default=Path("runs/denoiser/best"), help="denoiser checkpoint")
@click.option("--style-ckpt-path", type=click.Path(exists=True, path_type=Path), default=Path("runs/style/best"), help="style checkpoint")
@click.option("--output-path", type=click.Path(exists=False, dir_okay=False, path_type=Path), default=Path("inference.odt"), help="artifact output path")
@click.option("--half", is_flag=True, help="store bf16 weights (half the size; inference computes in bf16 anyway)")
def export_inference_cmd(latent_ckpt_path, denoiser_ckpt_path, style_ckpt_path, output_path, half):
    """merge the three training checkpoints into one inference artifact"""
    from osu_dreamer_tpu.models.inference import save_inference

    save_inference(latent_ckpt_path, denoiser_ckpt_path, style_ckpt_path, output_path, half=half)
    click.echo(f"wrote {output_path}")


# ----------------------------------------------------------------- predict --


@click.command("predict")
@click.option("--model-path", type=file_opt, required=True, help="inference artifact")
@click.option("--audio-file", "audio_files", type=file_opt, required=True, multiple=True, help="audio file(s) to map; repeatable for bulk generation")
@click.option("--diff", type=(float, float, float, float, float), multiple=True, help="difficulty conditioning (sr, ar, od, cs, hp); repeatable. NOTE: sr is this framework's first-party classic-model star rating (osu/difficulty.py) — close to, but not identical with, rosu-pp's current-algorithm values the reference trains on; models trained here interpret sr on the same scale the dataset was built with, so use sr values consistently within one pipeline")
@click.option("--sample-steps", type=int, default=8, help="number of diffusion steps")
@click.option("--style-guidance", type=float, default=1.0, help="classifier-free guidance over the style prior's null labels; 1.0 = plain conditional sampling (the reference's behavior), >1 sharpens difficulty adherence")
@click.option("--title", type=str, help="song title (read from audio tags when omitted; single audio file only)")
@click.option("--artist", type=str, help="song artist (read from audio tags when omitted; single audio file only)")
@click.option("--seed", type=int, default=None, help="sampling seed (default: random)")
@click.option("--infer-tempo", is_flag=True, help="estimate BPM/offset from the predicted onsets (beyond the reference, which emits a slider-velocity-derived tempo)")
@click.option("--snap-divisor", type=click.IntRange(min=0), default=0, help="snap hit times to 1/N of the inferred beat (4 = sixteenths, the ranked-map editor convention); implies --infer-tempo. 0 = off")
@click.option("--serialize-workers", type=click.IntRange(min=1), default=None, help="host processes decoding .osu files in bulk mode (default: up to 4; 1 = in-process)")
@click.option("--batch-songs", type=click.IntRange(min=1), default=1, help="songs sampled per device program in bulk mode. >1 batches songs of the same length class through one compiled pipeline (measured 67 -> 56 ms/map device time at 4); worth it for large bulk jobs, but each batch size compiles its own program first")
def predict(model_path, audio_files, diff, sample_steps, style_guidance, title, artist, seed, infer_tempo, snap_divisor, serialize_workers, batch_songs):
    """generate osu!std beatmaps from raw audio -> one .osz mapset per song.

    Bulk mode (repeated --audio-file): songs in the same ~6 s length class
    are batched through one compiled pipeline (--batch-songs per dispatch),
    and host-side .osu serialization (the MAP slider fitter is the CPU tail)
    fans out over worker processes while the device samples the next batch."""
    import os
    from collections import deque

    import jax
    import jax.numpy as jnp
    import numpy as np

    from osu_dreamer_tpu.audio import HOP_LEN, load_wave, prep_wave_for_model
    from osu_dreamer_tpu.models.inference import load_inference

    if len(audio_files) > 1 and (title or artist):
        raise click.ClickException("--title/--artist only apply to a single audio file")
    if not diff:
        diff = ((5.0, 9.0, 8.0, 4.0, 6.0),)

    model, params = load_inference(model_path)
    chunk = model.args.latent.chunk_size
    labels = jnp.asarray(diff, jnp.float32)
    base_seed = seed if seed is not None else random.randrange(2**31)

    n_osus = len(audio_files) * len(diff)
    if serialize_workers is None:
        serialize_workers = min(4, os.cpu_count() or 1, n_osus)
    pool = None
    if n_osus > 1 and serialize_workers > 1:
        pool = _spawn_serialize_pool(serialize_workers)

    batch_songs = min(batch_songs, len(audio_files))

    # data-parallel generation: with multiple devices visible and a song
    # batch to spread, shard the song axis over a 1-D `data` mesh — params
    # replicate, every per-song op is embarrassingly parallel, and XLA
    # runs each shard on its own chip (same mesh machinery as training DP).
    # Device sets: local devices only — under jax.distributed each process
    # feeds its own host-local waves, so the mesh must not span hosts here.
    song_sharding = None
    song_mesh = None
    devices = jax.local_devices()
    if len(devices) > 1 and batch_songs > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from osu_dreamer_tpu.parallel import data_parallel_mesh, replicate

        # use at most batch_songs devices (don't inflate a small requested
        # batch to the device count), then round the batch down to a multiple
        # of the devices actually used
        n_dev = min(len(devices), batch_songs)
        batch_songs -= batch_songs % n_dev
        mesh = data_parallel_mesh(devices[:n_dev])
        params = replicate(params, mesh)
        song_sharding = NamedSharding(mesh, PartitionSpec("data"))
        song_mesh = mesh
        click.echo(
            f"[parallel] sharding {batch_songs}-song batches over {n_dev} "
            f"of {len(devices)} devices"
        )
    else:
        # the artifact restores as host numpy arrays; pin them on device
        # ONCE — passed raw to a jitted function they would re-upload the
        # whole artifact (hundreds of MB) on every dispatch. (The DP branch
        # above places them itself, replicated across the mesh.)
        params = jax.device_put(params)

    # the shared fused featurizer+sampler program (one dispatch per song
    # batch; shard_map over the data mesh on multi-chip hosts) — the same
    # builder the serve service uses, so the two surfaces cannot diverge.
    # Labels are replicated: every song shares the CLI's --diff rows.
    from osu_dreamer_tpu.models.inference.sampler import (
        build_batch_sampler,
        dequantize_chart,
    )

    sample = build_batch_sampler(model, song_mesh, labels_sharded=False)

    # songs move: device sampling -> (pool) .osu decode -> .osz write; the
    # device never waits on the host tail
    queued: deque = deque()  # (audio_file, title, artist, [futures])

    # per-phase wall-clock attribution, printed when OSU_DREAMER_TIMING=1
    # (bench.py's e2e measurement parses it into the attribution table)
    import time as _time
    from collections import defaultdict
    from contextlib import contextmanager

    timers: dict = defaultdict(float)

    @contextmanager
    def _phase(name: str):
        t0 = _time.perf_counter()
        try:
            yield
        finally:
            timers[name] += _time.perf_counter() - t0

    def enqueue(audio_file, s_title, s_artist, L, chart, pred_labels) -> None:
        # chart/pred_labels arrive as HOST numpy here (one batch-wide
        # dequantized fetch in enqueue_batch, not a per-song transfer)
        signals = np.asarray(chart, np.float32)[:, :L].transpose(0, 2, 1)
        label_rows = np.asarray(pred_labels, np.float32)
        jobs = [
            (s_title, s_artist, audio_file.name, i, row, sig, infer_tempo,
             snap_divisor)
            for i, (row, sig) in enumerate(zip(label_rows, signals))
        ]
        if pool is None:
            with _phase("decode"):
                done = [_decode_osu_entry(*j) for j in jobs]
            with _phase("zip"):
                _write_mapset(audio_file, s_title, s_artist, done)
        else:
            queued.append(
                (audio_file, s_title, s_artist,
                 [pool.apply_async(_decode_osu_entry, j) for j in jobs])
            )

    def flush(block: bool) -> None:
        while queued and (block or all(r.ready() for r in queued[0][3])):
            audio_file, s_title, s_artist, results = queued.popleft()
            _write_mapset(audio_file, s_title, s_artist, [r.get() for r in results])

    D = labels.shape[0]

    def dispatch(batch: list, batch_i: int):
        """batch: list of (audio_file, title, artist, L, buf, real_frames,
        n_frames, out_frames) entries, all in the same (n_frames,
        out_frames) bucket"""
        n_frames, out_frames = batch[0][6], batch[0][7]
        rows = list(batch)
        # pad partial batches by repeating the last song: a fresh compile
        # per leftover batch size costs far more than the wasted rows (and
        # the song axis must stay divisible by the data mesh)
        while len(rows) < batch_songs:
            rows.append(rows[-1])
        if song_sharding is not None:
            waves = jax.device_put(np.stack([np.asarray(r[4]) for r in rows]), song_sharding)
            rfs = jax.device_put(np.asarray([r[5] for r in rows], np.int32), song_sharding)
        else:
            # single-device: each wave was device_put ASYNC at prep time
            # (overlapping its transfer with the previous batch's host
            # decode); stacking device arrays is a cheap on-device concat
            waves = jnp.stack([r[4] for r in rows])
            rfs = jnp.asarray([r[5] for r in rows], np.int32)
        hit_q, xy_q, pred_labels = sample(
            params, waves, rfs, labels, jax.random.PRNGKey(base_seed + batch_i),
            n_frames, out_frames, sample_steps, style_guidance,
        )  # async dispatch: returns before the device finishes
        # kick the device->host copies NOW: the quantized chart transfer
        # then overlaps the next batch's host prep/dispatch instead of
        # blocking inside enqueue_batch's np.asarray
        for a in (hit_q, xy_q, pred_labels):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        return batch, hit_q, xy_q, pred_labels

    def enqueue_batch(batch, hit_q, xy_q, pred_labels) -> None:
        # ONE batch-wide fetch + dequantize (per-song device slices each
        # paid their own relay round trip)
        with _phase("fetch"):
            chart = dequantize_chart(hit_q, xy_q)
            label_rows = np.asarray(pred_labels, np.float32)
        for s, (audio_file, s_title, s_artist, L, *_rest) in enumerate(batch):
            enqueue(
                audio_file, s_title, s_artist, L,
                chart[s * D : (s + 1) * D], label_rows[s * D : (s + 1) * D],
            )

    pending = None  # (batch, hit_q, xy_q, pred_labels)
    batch: list = []
    batch_i = 0
    for i, audio_file in enumerate(audio_files):
        song_title, song_artist = _resolve_metadata(audio_file, title, artist)
        click.echo(f"[{i + 1}/{len(audio_files)}] {audio_file.name}: featurizing...")
        with _phase("load_wave"):
            wave = load_wave(audio_file)
        L = max(1, -(-len(wave) // HOP_LEN))
        with _phase("prep"):
            buf, real_frames, n_frames, out_frames = prep_wave_for_model(wave, chunk)
            if song_sharding is None:
                # start the wave transfer NOW (async): it rides the link
                # while the previous batch's .osu decode runs on the host
                buf = jax.device_put(buf)
        entry = (audio_file, song_title, song_artist, L, buf, real_frames, n_frames, out_frames)

        # a bucket change or a full batch flushes the current one
        if batch and (
            len(batch) == batch_songs
            or (batch[0][6], batch[0][7]) != (n_frames, out_frames)
        ):
            click.echo(f"  sampling {len(batch)} song(s) x {D} difficulties at {sample_steps} steps...")
            with _phase("upload_dispatch"):
                out = dispatch(batch, batch_i)
            batch_i += 1
            batch = []
            if pending is not None:
                enqueue_batch(*pending)  # overlaps the async device work
                flush(block=False)
            pending = out
        batch.append(entry)

    if batch:
        click.echo(f"  sampling {len(batch)} song(s) x {D} difficulties at {sample_steps} steps...")
        with _phase("upload_dispatch"):
            out = dispatch(batch, batch_i)
        if pending is not None:
            enqueue_batch(*pending)
            flush(block=False)
        pending = out
    if pending is not None:
        enqueue_batch(*pending)
    flush(block=True)
    if pool is not None:
        pool.close()
        pool.join()
    if os.environ.get("OSU_DREAMER_TIMING"):
        total = sum(timers.values())
        parts = " ".join(f"{k}={v * 1e3:.0f}ms" for k, v in sorted(timers.items()))
        click.echo(f"[timing] host-phase totals: {parts} (sum {total * 1e3:.0f}ms;"
                   " device compute overlaps upload_dispatch/fetch waits)")


def _spawn_serialize_pool(workers: int):
    """spawn-context .osu-decode pool (shared impl: utils/procpool.py)"""
    from osu_dreamer_tpu.utils.procpool import spawn_serialize_pool

    return spawn_serialize_pool(workers)


def _decode_osu_entry(title, artist, audio_name, version_i, label_row, signal,
                      infer_tempo, snap_divisor=0):
    """one difficulty's .osu text — thin pool-worker shim over the shared
    signal.serialize.decode_osu_entry (also used by serve)"""
    from osu_dreamer_tpu.signal.serialize import decode_osu_entry

    return decode_osu_entry(
        title, artist, audio_name, version_i, label_row, signal,
        infer_tempo=infer_tempo, snap_divisor=snap_divisor,
    )


def _write_mapset(audio_file, title, artist, entries) -> None:
    from zipfile import ZipFile

    hex_chars = "0123456789abcdef"
    while True:
        tag = "".join(random.choice(hex_chars) for _ in range(7))
        mapset = Path(f"_{tag} {artist} - {title}.osz")
        if not mapset.exists():
            break

    with ZipFile(mapset, "x") as archive:
        archive.write(audio_file, audio_file.name)
        for name, text in entries:
            archive.writestr(name, text)
    click.echo(f"  wrote {mapset}")


# ---------------------------------------------------------------- serve -----


@click.command("serve")
@click.option("--model-path", type=file_opt, required=True, help="trained inference artifact (export-inference output)")
@click.option("--host", default="127.0.0.1", show_default=True, help="bind address")
@click.option("--port", type=int, default=8787, show_default=True, help="bind port")
@click.option("--max-batch", type=click.IntRange(min=1), default=4, show_default=True, help="max concurrent songs batched into one device program")
@click.option("--batch-window-ms", type=float, default=25.0, show_default=True, help="how long the dispatcher waits to widen a batch")
@click.option("--infer-tempo", is_flag=True, help="infer real timing points from the predicted onset envelope")
@click.option("--snap-divisor", type=click.IntRange(min=0), default=0, help="snap hit times to 1/N of the inferred beat; implies --infer-tempo. 0 = off")
@click.option("--devices", type=click.IntRange(min=1), default=None, help="local devices to shard request batches over (default: all; batches pad to a multiple of this)")
@click.option("--serialize-workers", type=click.IntRange(min=1), default=None, help=".osu-decode worker processes (default: one per core, up to 4; 1 disables the pool)")
def serve(model_path: Path, host: str, port: int, max_batch: int, batch_window_ms: float, infer_tempo: bool, snap_divisor: int, devices: Optional[int], serialize_workers: Optional[int]):
    """run a resident map-generation HTTP service (POST /generate).

    Beyond the reference's one-shot predict CLI: loads the artifact once,
    owns the chip, and batches concurrent requests through one compiled
    program (serve/service.py for the batching model, serve/http.py for the
    endpoints)."""
    from osu_dreamer_tpu.serve import GeneratorService, MapServer

    service = GeneratorService(
        model_path,
        max_batch=max_batch,
        batch_window_ms=batch_window_ms,
        infer_tempo=infer_tempo,
        snap_divisor=snap_divisor,
        devices=devices,
        serialize_workers=serialize_workers,
    )
    server = MapServer(service, host=host, port=port)
    bound_host, bound_port = server.address
    if service.n_devices > 1:
        click.echo(
            f"[parallel] sharding request batches over {service.n_devices} "
            f"devices (batches pad to multiples of {service.n_devices})"
        )
    click.echo(f"serving on http://{bound_host}:{bound_port} (POST /generate, GET /healthz /stats)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        click.echo("shutting down")
    finally:
        server.close()


def _resolve_metadata(audio_file: Path, title: Optional[str], artist: Optional[str]):
    """fill missing title/artist from the audio's container tags: the
    first-party libav reader (ID3/Vorbis/MP4 via native/audiodecode_av.cpp)
    first, tinytag if importable (the reference's reader,
    scripts/predict.py:40-52), then filename fallbacks"""
    if title is None or artist is None:
        from osu_dreamer_tpu import native

        if native.av_available():
            t, a = native.av_tags(audio_file)
            title = title or (t or None)
            artist = artist or (a or None)
    if title is None or artist is None:
        try:
            from tinytag import TinyTag

            tags = TinyTag.get(audio_file)
            title = title or tags.title
            artist = artist or tags.artist
        except ImportError:
            pass
    if not title:
        title = audio_file.stem
    if not artist:
        artist = "Unknown Artist"
    return title, artist

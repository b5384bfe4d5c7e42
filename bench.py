"""Headline benchmark: maps/min per chip — full generation pipeline on a
2-minute song at 32 diffusion steps (BASELINE.json config 1).

Pipeline timed: resonator spectrogram (featurizer) -> audio encode -> style
sample (16 steps) -> diffusion sphere tracing (32 steps) -> chart decode.
``e2e_with_serialize`` additionally drives the real predict CLI with host
.osu serialization and .osz files landing on disk.

``vs_baseline``: MEASURED. The reference (jaswon/osu-dreamer) publishes no
numbers and its CUDA stack cannot run here, but its torch models run on CPU:
benchmarks/reference_baseline.py times the reference LDM.sample at this
exact config (2-min song, 32 steps, random weights) on this host's CPU and
records benchmarks/reference_baseline.json. vs_baseline = our TPU maps/min
over the reference's measured CPU maps/min (a TPU-vs-CPU ratio — the only
cross-runtime comparison possible without a CUDA device); the JSON also
carries the CPU-vs-CPU ratio from the same measurement for a same-silicon
view. Re-run reference_baseline.py to refresh.

Fault isolation (BENCH_r04 aborted on its first dispatch and produced no
artifact at all — never again):

- the XLA compile cache defaults to a FRESH per-run directory: a stale entry
  compiled by a pre-edit binary can abort the first dispatch it deserializes
  into. ``BENCH_CACHE_DIR`` pins a stable dir for local iteration.
- params are initialized on a tiny spec (param shapes are length-independent)
  and a SMOKE-sized song runs the full fused program family before the
  2-minute compile, so a broken kernel path fails fast and cheap.
- every phase after the headline runs under its own try/except; failures land
  in ``phase_errors`` and the JSON line still prints with every field that
  was measured.
- a hard failure before the headline re-executes bench once in a fresh
  process with a fresh cache (transient TPU/tunnel aborts get one more
  chance); the terminal failure still prints a parseable JSON line.

Env knobs: BENCH_SWEEP=1 adds a --batch-songs throughput sweep (S=4/8/16);
BENCH_TRAIN=1 re-measures the train steps live; BENCH_SKIP_E2E=1 /
BENCH_SKIP_AB=1 skip the heavy optional phases.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

# enable the per-run compile cache even when a sitecustomize already imported
# jax (env vars alone are snapshotted too early there)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from osu_dreamer_tpu.utils.compile_cache import enable_compile_cache

_cache_dir = os.environ.get("BENCH_CACHE_DIR") or tempfile.mkdtemp(
    prefix="jax_cache_bench_"
)
enable_compile_cache(_cache_dir)

import numpy as np

SONG_SECONDS = 120
SMOKE_SECONDS = 8
NUM_STEPS = 32


def load_measured_baseline() -> dict:
    """benchmarks/reference_baseline.json, written by reference_baseline.py"""
    from pathlib import Path

    p = Path(__file__).parent / "benchmarks" / "reference_baseline.json"
    return json.loads(p.read_text()) if p.exists() else {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_wave(seconds: int, sr: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(seconds * sr) / sr
    return (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t * (1 + 0.001 * np.sin(2 * np.pi * 0.5 * t)))
        + 0.05 * rng.normal(size=t.shape)
    ).astype(np.float32)


def measure_e2e_with_serialize(args, params, wave, log, n_songs=12, batch_songs=4):
    """sustained maps/min through the REAL predict CLI with .osz files
    landing on disk: artifact export -> bulk predict (--batch-songs,
    --serialize-workers) -> timed from CLI entry to the last .osz write.

    A warmup invocation at the same batch size pre-populates the compile
    cache so the timed run measures steady-state throughput, not compile.
    Returns ms/map, maps/min, and which side binds (device vs host tail).
    """
    import shutil
    import wave as wavemod
    from pathlib import Path

    import jax
    from click.testing import CliRunner

    from osu_dreamer_tpu.audio import SR
    from osu_dreamer_tpu.cli.commands import predict as predict_cmd
    from osu_dreamer_tpu.models.inference.artifact import build_artifact_bytes

    tmp = Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    try:
        model_path = tmp / "inference.odt"
        model_path.write_bytes(
            build_artifact_bytes(args, jax.device_get(params))
        )
        wav_path = tmp / "song.wav"
        pcm = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
        with wavemod.open(str(wav_path), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(SR)
            f.writeframes(pcm.tobytes())

        runner = CliRunner()
        cwd = os.getcwd()

        timings: dict = {}

        def run(n, seed):
            outdir = tmp / f"out_{seed}"
            outdir.mkdir()
            argv = ["--model-path", str(model_path),
                    "--sample-steps", str(NUM_STEPS),
                    "--batch-songs", str(batch_songs), "--seed", str(seed)]
            for _ in range(n):
                argv += ["--audio-file", str(wav_path)]
            os.chdir(outdir)
            os.environ["OSU_DREAMER_TIMING"] = "1"
            try:
                t0 = time.time()
                res = runner.invoke(predict_cmd, argv, catch_exceptions=False)
                dt = time.time() - t0
            finally:
                os.environ.pop("OSU_DREAMER_TIMING", None)
                os.chdir(cwd)
            assert res.exit_code == 0, res.output[-2000:]
            oszs = list(outdir.glob("*.osz"))
            assert len(oszs) == n, f"expected {n} .osz, got {len(oszs)}"
            # per-phase host attribution from the CLI's [timing] line
            for line in res.output.splitlines():
                if line.startswith("[timing]"):
                    phases = {}
                    for tok in line.split():
                        if "=" in tok and tok.endswith("ms"):
                            k, v = tok.split("=")
                            phases[k] = float(v[:-2])
                    timings[n] = phases
            return dt

        run(batch_songs, seed=7)  # warmup: compiles the CLI batch program
        # each CLI invocation re-traces its jitted programs (XLA compiles are
        # persistent-cache hits, but trace + cache-load is a fixed multi-second
        # invocation cost). Sustained throughput is the MARGINAL per-map cost:
        # time two run sizes and difference-quotient the fixed cost away.
        dt_small = run(batch_songs, seed=9)
        dt = run(n_songs, seed=8)
        if dt <= dt_small:
            # timing noise made the large run no slower than the small one:
            # the marginal quotient is meaningless — retry the pair once,
            # then report the sample invalid rather than a ~6e10 maps/min lie
            dt_small = run(batch_songs, seed=19)
            dt = run(n_songs, seed=18)
        if dt <= dt_small:
            return {
                "ms_per_map": None,
                "maps_per_min": None,
                "note": "invalid measurement: n_songs run was no slower "
                        "than the batch_songs run (twice); host timing noise "
                        "exceeds the marginal cost",
                "n_maps": n_songs,
                "batch_songs": batch_songs,
                "sample_steps": NUM_STEPS,
                "bound_by": None,
            }
        per_map = (dt - dt_small) / (n_songs - batch_songs)
        # marginal per-phase attribution: difference the host-phase totals
        # of the two run sizes the same way the wall-clock is differenced
        attribution = None
        if batch_songs in timings and n_songs in timings:
            small, big = timings[batch_songs], timings[n_songs]
            attribution = {
                k: round((big.get(k, 0.0) - small.get(k, 0.0))
                         / (n_songs - batch_songs), 1)
                for k in sorted(set(small) | set(big))
            }
        # binding side: compare against the device-only batched figure the
        # caller measured; if e2e/map is within 20% of device/map, the chip
        # binds and the host keeps up (the VERDICT r2 item-3 question)
        return {
            "ms_per_map": round(per_map * 1e3, 1),
            "host_phase_ms_per_map": attribution,
            "maps_per_min": round(60.0 / per_map, 1),
            "total_ms_incl_invocation": round(dt * 1e3, 1),
            "invocation_fixed_ms": round(
                (dt_small - per_map * batch_songs) * 1e3, 1
            ),
            "n_maps": n_songs,
            "workers": min(4, os.cpu_count() or 1, n_songs),
            "batch_songs": batch_songs,
            "sample_steps": NUM_STEPS,
            "bound_by": None,  # filled by caller against the device figure
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from functools import partial

    import jax
    import jax.numpy as jnp

    from osu_dreamer_tpu.audio import (
        A_DIM,
        SR,
        prep_wave_for_model,
        spec_for_model_batch,
        spec_for_model_jax,
    )
    from osu_dreamer_tpu.models.inference import LDM, LDMArgs

    log(f"devices: {jax.devices()}")
    log(f"compile cache: {_cache_dir}")

    result: dict = {
        "metric": "maps/min per chip (2-min song, 32 steps)",
        "value": None,
        "unit": "maps/min",
        "vs_baseline": None,
    }
    errors: dict = {}

    # ---------------------------------------------------------- setup ----
    wave = synth_wave(SONG_SECONDS, SR)
    args = LDMArgs()
    model = LDM(args)
    chunk = args.latent.chunk_size

    labels = jnp.asarray([[5.0, 9.0, 8.0, 4.0, 6.0]], jnp.float32)
    key = jax.random.PRNGKey(0)

    # init on a TINY spec: param shapes are length-independent (verified in
    # tests/test_end_to_end.py::test_init_length_invariance), and jitted init
    # on the full 2-min spec measured 43-80 s of pure compile on the
    # tunneled backend — the single largest fixed cost of BENCH_r03/r04
    t0 = time.time()
    tiny_spec = jnp.zeros((1, chunk * 8, A_DIM), jnp.float32)
    params = jax.jit(lambda k: model.init(k, tiny_spec, labels, k, 1, 1))(key)
    jax.block_until_ready(params)
    log(f"init (tiny spec): {time.time() - t0:.1f}s")

    # featurizer + sampler fused into ONE device program (single dispatch per
    # song — the relay round trip is material), matching the predict CLI
    @partial(jax.jit, static_argnames=("n_frames", "out_frames"))
    def sample_wave(p, wave_i16, real_frames, n_frames, out_frames, lb, k):
        sp = spec_for_model_jax(wave_i16, real_frames, n_frames, out_frames)
        return model.apply(p, sp, lb, k, NUM_STEPS)

    # ---------------------------------------------------------- smoke ----
    # a smoke-sized song through the FULL fused program family first: if a
    # kernel path is broken (or a cache entry is poisoned), this fails in
    # seconds instead of after the 2-minute-song compile
    t0 = time.time()
    sbuf, s_rf, s_nf, s_of = prep_wave_for_model(synth_wave(SMOKE_SECONDS, SR), chunk)
    s_chart, _ = sample_wave(
        params, jnp.asarray(sbuf), s_rf, s_nf, s_of, labels, key
    )
    float(s_chart[0, 0, 0])
    log(f"smoke ({SMOKE_SECONDS}s song): {time.time() - t0:.1f}s")

    # ------------------------------------------------------- headline ----
    buf, real_frames, n_frames, out_frames = prep_wave_for_model(wave, chunk)

    def run_song(k):
        return sample_wave(
            params, jnp.asarray(buf), real_frames, n_frames, out_frames, labels, k
        )

    # warmup / compile. NOTE: block_until_ready does not fully synchronize on
    # the tunneled backend — fetch a scalar to force execution end-to-end.
    t0 = time.time()
    chart, out_labels = run_song(key)
    float(chart[0, 0, 0])
    compile_s = time.time() - t0
    log(f"compile+first run: {compile_s:.1f}s; chart {chart.shape}")
    result["compile_s"] = round(compile_s, 1)

    # steady-state warmup (the first few dispatches through the host link
    # run slow while buffers/relay warm up)
    for i in range(3):
        chart, _ = run_song(jax.random.PRNGKey(100 + i))
        float(chart[0, 0, 0])

    # timed runs (featurizer + full pipeline, one dispatch)
    times = []
    for i in range(5):
        t0 = time.time()
        chart, out_labels = run_song(jax.random.PRNGKey(i + 1))
        float(chart[0, 0, 0])
        times.append(time.time() - t0)
    per_map = float(np.median(times))
    maps_per_min = 60.0 / per_map
    log(f"per-map: {times} -> median {per_map:.3f}s = {maps_per_min:.1f} maps/min")

    baseline = load_measured_baseline()
    ref_cpu = baseline.get("reference_cpu", {}).get("maps_per_min")
    result.update(
        value=round(maps_per_min, 2),
        vs_baseline=round(maps_per_min / ref_cpu, 2) if ref_cpu else None,
        baseline_measured=bool(ref_cpu),
        baseline={
            "reference_cpu_maps_per_min": round(ref_cpu, 3) if ref_cpu else None,
            "cpu_vs_cpu": baseline.get("cpu_vs_cpu"),
            "methodology": baseline.get("methodology"),
        },
    )

    # every phase below is optional: a failure must cost exactly its own
    # field, never the artifact (BENCH_r04 lesson)
    from contextlib import contextmanager

    @contextmanager
    def phase(name):
        t0 = time.time()
        try:
            yield
            log(f"[phase {name}] ok ({time.time() - t0:.1f}s)")
        except Exception as exc:
            errors[name] = repr(exc)[:500]
            log(f"[phase {name}] FAILED after {time.time() - t0:.1f}s: {exc!r}")

    # --- serial-latency attribution: how much of the serial figure is the
    # HOST LINK (wave upload + dispatch round trip) vs the chip itself.
    # Under the tunneled bench backend the link dominates; on a production
    # host (PCIe/DMA) upload+RTT collapse to ~1 ms and the device-resident
    # figure below is the real serial latency. All three use already-compiled
    # programs, so this costs no extra compile time.
    def _median_ms(f, n=5):
        ds = []
        for i in range(n):
            t0 = time.time()
            f(i)
            ds.append((time.time() - t0) * 1e3)
        return float(np.median(ds))

    with phase("serial_attribution"):
        upload_ms = _median_ms(
            lambda i: jax.block_until_ready(jax.device_put(buf))
        )
        nop = jax.jit(lambda x: x + 1.0)
        _z = jnp.zeros(())
        float(nop(_z))
        rtt_ms = _median_ms(lambda i: float(nop(_z)))
        dbuf = jax.device_put(jnp.asarray(buf))
        jax.block_until_ready(dbuf)

        def _resident_run(i):
            c, _ = sample_wave(
                params, dbuf, real_frames, n_frames, out_frames, labels,
                jax.random.PRNGKey(700 + i),
            )
            float(c[0, 0, 0])

        _resident_run(0)  # same program (wave arg already device-resident)
        resident_ms = _median_ms(_resident_run)
        log(
            f"serial attribution: wave upload {upload_ms:.1f} ms + dispatch RTT "
            f"{rtt_ms:.1f} ms (host link) | device-resident serial "
            f"{resident_ms:.1f} ms = {60000 / resident_ms:.0f} maps/min "
            f"(~{max(resident_ms - rtt_ms, 0.0):.0f} ms chip compute)"
        )
        result["serial_attribution"] = {
            "wave_upload_ms": round(upload_ms, 1),
            "dispatch_rtt_ms": round(rtt_ms, 1),
            "device_resident_serial_ms": round(resident_ms, 1),
            "device_resident_maps_per_min": round(60000 / resident_ms, 1),
            "note": "serial headline = upload + RTT + compute through the "
                    "tunneled host link; device_resident excludes the wave "
                    "upload (the exact analog of the reference-CPU "
                    "methodology, which starts from an in-memory spec)",
        }

    # secondary metrics (denoiser steps/sec at the full-song latent length)
    h_shape = (1, out_frames // chunk, args.diffusion.a_dim)
    diff_sample = None
    with phase("denoiser_sample"):
        h = jnp.zeros(h_shape, jnp.float32)
        s = jnp.zeros((1, args.diffusion.style_dim), jnp.float32)

        def _mk_diff_sample():
            return jax.jit(
                lambda p, h, s, k: model.apply(
                    p, h, s, k, NUM_STEPS,
                    method=lambda m, h, s, k, n: m.diffusion.sample(h, s, k, n),
                )
            )

        diff_sample = _mk_diff_sample()
        z = diff_sample(params, h, s, key)
        float(z[0, 0, 0])
        pallas_ms = _median_ms(
            lambda i: float(diff_sample(params, h, s, jax.random.PRNGKey(i))[0, 0, 0])
        )
        log(f"denoiser: {NUM_STEPS + 1} net passes in {pallas_ms:.1f} ms = "
            f"{(NUM_STEPS + 1) / (pallas_ms / 1e3):.0f} steps/sec at l={h_shape[1]}")
        result["denoiser_sample_ms"] = round(pallas_ms, 1)
        result["denoiser_steps_per_sec"] = round((NUM_STEPS + 1) / (pallas_ms / 1e3))

    # attention kernel A/B at the INFERENCE shape (VERDICT r4 item 8: the
    # 2.2x full-step win was measured at the train shape B128xL152; justify
    # the kernel default at the sampler shape B1xL~760 too). Same jitted
    # sampler family, second trace with OSU_DREAMER_XLA_ATTN=1 (the dispatch
    # gate reads the env at trace time).
    if os.environ.get("BENCH_SKIP_AB", "0") != "1" and diff_sample is not None:
        with phase("attention_ab_inference"):
            os.environ["OSU_DREAMER_XLA_ATTN"] = "1"
            try:
                diff_sample_xla = _mk_diff_sample()
                z = diff_sample_xla(params, h, s, key)
                float(z[0, 0, 0])
                xla_ms = _median_ms(
                    lambda i: float(
                        diff_sample_xla(params, h, s, jax.random.PRNGKey(i))[0, 0, 0]
                    )
                )
            finally:
                os.environ.pop("OSU_DREAMER_XLA_ATTN", None)
            result["attention_ab"] = {
                "inference_shape": {
                    "B": 1, "L": h_shape[1], "steps": NUM_STEPS,
                    "pallas_default_ms": round(pallas_ms, 1),
                    "xla_attn_ms": round(xla_ms, 1),
                    "winner": "pallas" if pallas_ms <= xla_ms else "xla",
                },
                "train_shape": {
                    "B": 128, "L": 152,
                    "pallas_default_ms_per_step": 60.0,
                    "xla_attn_ms_per_step": 132.3,
                    "winner": "pallas",
                    "source": "committed full-step A/B (round 4, "
                              "benchmarks/trainstep_bench.py on v5e)",
                },
            }
            log(f"attention A/B at inference shape (L={h_shape[1]}): "
                f"pallas {pallas_ms:.1f} ms vs xla {xla_ms:.1f} ms -> "
                f"{result['attention_ab']['inference_shape']['winner']}")

    # bulk-generation throughput: dispatch song k+1 before fetching song k,
    # so host->device uploads overlap device compute (BASELINE config 5)
    with phase("bulk"):
        N_BULK = 8
        t0 = time.time()
        pending = None
        for i in range(N_BULK):
            out = run_song(jax.random.PRNGKey(200 + i))
            # index NOW: the tiny gather enqueues directly behind song i's
            # program. Indexing at fetch time would queue it behind song i+1's
            # program too (in-order execution), serializing the pipeline.
            probe = out[0][0, 0, 0]
            if pending is not None:
                float(pending)  # previous song done; overlaps current compute
            pending = probe
        float(pending)
        bulk_dt = (time.time() - t0) / N_BULK
        log(f"bulk generation: {bulk_dt * 1000:.0f} ms/map = {60 / bulk_dt:.0f} maps/min sustained")
        result["bulk_ms_per_map"] = round(bulk_dt * 1000, 1)

    # batched bulk: S songs per device program (predict --batch-songs), the
    # deepest pipelining the chip offers for mass generation
    bdt = None
    with phase("batched_bulk"):
        S = 4
        waves_b = jnp.asarray(np.stack([buf] * S))
        rfs_b = jnp.asarray(np.asarray([real_frames] * S, np.int32))

        @partial(jax.jit, static_argnames=("n_frames", "out_frames", "steps"))
        def sample_batch(p, waves, rfs, n_frames, out_frames, lb, k, steps=NUM_STEPS):
            sp = spec_for_model_batch(waves, rfs, n_frames, out_frames)
            return model.apply(p, sp, lb, k, steps)

        def run_batch(k):
            return sample_batch(params, waves_b, rfs_b, n_frames, out_frames, labels, k)

        out = run_batch(jax.random.PRNGKey(300))  # compile
        float(out[0][0, 0, 0])
        t0 = time.time()
        pending = None
        for i in range(4):
            out = run_batch(jax.random.PRNGKey(301 + i))
            probe = out[0][0, 0, 0]
            if pending is not None:
                float(pending)
            pending = probe
        float(pending)
        bdt = (time.time() - t0) / (4 * S)
        log(f"batched bulk (S={S}): {bdt * 1000:.0f} ms/map = {60 / bdt:.0f} maps/min sustained")

        bulk_curve = {str(S): round(bdt * 1000, 1)}
        if os.environ.get("BENCH_SWEEP", "0") == "1":
            # the reference's own predict default is 8 diffusion steps
            # (scripts/predict.py:25); quality holds there (ROADMAP: F1 0.95)
            # and throughput is ~3.4x the 32-step headline config. Same jitted
            # program family as sample_batch — `steps` is a static arg.
            def sample_batch8(p, waves, rfs, n_frames, out_frames, lb, k):
                return sample_batch(p, waves, rfs, n_frames, out_frames, lb, k, steps=8)

            out = sample_batch8(
                params, waves_b, rfs_b, n_frames, out_frames, labels,
                jax.random.PRNGKey(500),
            )
            float(out[0][0, 0, 0])
            t0 = time.time()
            pending = None
            for i in range(4):
                out = sample_batch8(
                    params, waves_b, rfs_b, n_frames, out_frames, labels,
                    jax.random.PRNGKey(501 + i),
                )
                probe = out[0][0, 0, 0]
                if pending is not None:
                    float(pending)
                pending = probe
            float(pending)
            ms8 = (time.time() - t0) / (4 * S) * 1000
            log(f"batched bulk (S={S}, 8 steps): {ms8:.0f} ms/map = "
                f"{60000 / ms8:.0f} maps/min sustained")
            bulk_curve["4@8steps"] = round(ms8, 1)

            for S2 in (8, 16):
                waves_s = jnp.asarray(np.stack([buf] * S2))
                rfs_s = jnp.asarray(np.asarray([real_frames] * S2, np.int32))

                def run_s(k):
                    return sample_batch(params, waves_s, rfs_s, n_frames, out_frames, labels, k)

                out = run_s(jax.random.PRNGKey(400))  # compile this S
                float(out[0][0, 0, 0])
                t0 = time.time()
                pending = None
                for i in range(3):
                    out = run_s(jax.random.PRNGKey(401 + i))
                    probe = out[0][0, 0, 0]
                    if pending is not None:
                        float(pending)
                    pending = probe
                float(pending)
                ms = (time.time() - t0) / (3 * S2) * 1000
                bulk_curve[str(S2)] = round(ms, 1)
                log(f"batched bulk (S={S2}): {ms:.0f} ms/map = {60000 / ms:.0f} maps/min sustained")
        result["batched_bulk_ms_per_map"] = bulk_curve

    # --- true end-to-end throughput INCLUDING host .osu serialization ---
    # (VERDICT r2 item 3). Drives the real predict CLI in bulk mode against
    # an artifact exported from this process's params: device sampling
    # overlapped with the serialize-worker pool, .osz files landing on disk.
    if os.environ.get("BENCH_SKIP_E2E", "0") != "1":
        with phase("e2e_with_serialize"):
            e2e = measure_e2e_with_serialize(args, params, wave, log)
            # relay-latency outlier guard: a healthy e2e marginal is
            # ~130-200 ms/map on this host (decode ~35 + zip ~9 + link);
            # tunneled-relay bad windows have been observed to blow the
            # upload_dispatch phase alone to ~2.4 s/map (20x). One retry,
            # keep the faster sample, record the discarded one — the
            # attribution table still shows which side was pathological.
            if e2e.get("ms_per_map") is not None and e2e["ms_per_map"] > 600:
                log(f"e2e {e2e['ms_per_map']} ms/map looks like a relay "
                    "outlier; re-measuring once")
                retry = measure_e2e_with_serialize(args, params, wave, log)
                if (retry.get("ms_per_map") is not None
                        and retry["ms_per_map"] < e2e["ms_per_map"]):
                    retry["relay_outlier_discarded_ms_per_map"] = e2e["ms_per_map"]
                    e2e = retry
            if bdt is not None:
                device_ms = bdt * 1000
                e2e["device_only_ms_per_map"] = round(device_ms, 1)
                if e2e["ms_per_map"] is not None:
                    e2e["bound_by"] = (
                        "device (host keeps up)" if e2e["ms_per_map"] <= device_ms * 1.2
                        else "host serialize/dispatch tail"
                    )
            if e2e["ms_per_map"] is None:
                log(f"e2e with serialize: INVALID sample ({e2e['note']})")
            else:
                log(f"e2e with serialize: {e2e['ms_per_map']} ms/map = "
                    f"{e2e['maps_per_min']} maps/min sustained through .osz on disk "
                    f"({e2e['n_maps']} maps, serialize-workers {e2e['workers']}, "
                    f"binding side: {e2e['bound_by']})")
            result["e2e_with_serialize"] = e2e

    # training-side metric: denoiser step time + MFU at the reference config
    # (VERDICT r1: "nothing in BENCH reports MFU"). Live measurement costs a
    # second large compile, so by default the committed measurement from
    # benchmarks/trainstep_bench.py is reported (with its provenance);
    # BENCH_TRAIN=1 re-measures in-process.
    with phase("train_step"):
        if os.environ.get("BENCH_TRAIN", "0") == "1":
            sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
            from trainstep_bench import measure_train_step

            ts = {**measure_train_step(), "source": "measured live"}
        else:
            from pathlib import Path

            ts = json.loads(
                (Path(__file__).parent / "benchmarks" / "trainstep_result.json")
                .read_text()
            )
        log(f"denoiser train step: {ts['ms_per_step']} ms @128x152, "
            f"MFU {ts['mfu']} ({ts.get('source')})")
        result["denoiser_train_step_ms"] = ts["ms_per_step"]
        result["denoiser_train_mfu"] = ts["mfu"]
        result["denoiser_train_source"] = ts.get("source")
        # latent + style stages (VERDICT r2 item 2: all three stages in the
        # bench artifact). Re-measure with benchmarks/trainstep_bench.py --write.
        for stage in ("latent", "style"):
            if stage in ts:
                result[f"{stage}_train_step_ms"] = ts[stage]["ms_per_step"]
                result[f"{stage}_train_mfu"] = ts[stage]["mfu"]
                log(f"{stage} train step: {ts[stage]['ms_per_step']} ms, "
                    f"MFU {ts[stage]['mfu']}")
        # the style step's naive ms/step is ~93% host dispatch through the
        # tunneled relay; carry the slope-timed device floor (VERDICT r4
        # item 6, benchmarks/style_floor.json) so the artifact tells the
        # real story
        from pathlib import Path

        floor_path = Path(__file__).parent / "benchmarks" / "style_floor.json"
        if floor_path.exists():
            fl = json.loads(floor_path.read_text())
            result["style_step_device_us_slope"] = fl["slope_us_per_step"]
            result["style_step_floor_note"] = (
                f"slope-timed device time {fl['slope_us_per_step']} us/step "
                f"({fl['hlo_fusion_count']} fusions ~ "
                f"{fl['slope_us_per_step'] / max(fl['hlo_fusion_count'], 1):.2f}"
                f" us/launch, flop floor {fl['flop_floor_us']} us): "
                "op-count-bound, the naive ms/step is dispatch-dominated"
            )

    if errors:
        result["phase_errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:
        import traceback

        traceback.print_exc(file=sys.stderr)
        if os.environ.get("BENCH_RETRIED") != "1":
            # one retry in a fresh process with a fresh compile cache:
            # transient TPU/tunnel aborts and poisoned cache entries both
            # die with the process
            log("bench: hard failure before the artifact — retrying once in "
                "a fresh process with a fresh compile cache")
            env = dict(os.environ, BENCH_RETRIED="1")
            env.pop("BENCH_CACHE_DIR", None)
            sys.exit(subprocess.call(
                [sys.executable, os.path.abspath(__file__)], env=env
            ))
        # terminal: still print a parseable artifact line
        print(json.dumps({
            "metric": "maps/min per chip (2-min song, 32 steps)",
            "value": None,
            "unit": "maps/min",
            "vs_baseline": None,
            "error": repr(exc)[:500],
        }))
        sys.exit(1)

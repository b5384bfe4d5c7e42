"""Corpus-scale ingest stress run (VERDICT r2 item 10).

The live HF corpus needs egress, so this drives the OFFLINE ingest path
(`generate-data --songs-dir`, the same build_dataset code path the HF branch
shares) at corpus scale: hundreds-to-thousands of synthetic `.osz` mapsets,
a controlled fraction of them deliberately corrupted, through the real CLI.

Validates, and reports as one JSON line:
  - sustained ingest throughput (mapsets/min and maps/min) at scale;
  - error isolation: every corruption class (truncated zip, non-audio
    bytes behind an audio name, unparseable .osu, missing audio entry) is
    skipped without killing the build;
  - output integrity: spec.npy + per-map .map.npy counts match the healthy
    population, and a rerun is incremental (hash-keyed dirs already built).

Usage (CPU works; TPU featurizes faster):
    python benchmarks/ingest_stress.py --mapsets 300 [--seconds 12]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# enable the persistent compile cache even when a sitecustomize already
# imported jax (env vars alone are snapshotted too early there)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) 
                if "benchmarks" in os.path.dirname(os.path.abspath(__file__))
                else os.path.dirname(os.path.abspath(__file__)))
from osu_dreamer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/jax_cache_bench")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_osz_library(songs_dir: Path, n: int, seconds: float, seed: int) -> dict:
    """n mapsets as .osz archives; every 25th is corrupted in a rotating
    way. Returns {"healthy": int, "corrupt": {kind: count}}"""
    from osu_dreamer_tpu.data.synth import make_mapset, write_wav

    rng = np.random.default_rng(seed)
    songs_dir.mkdir(parents=True, exist_ok=True)
    corrupt: dict[str, int] = {}
    healthy = 0
    # exact expectations so the isolation check has no slack: an
    # unparseable_osu mapset corrupts ONE diff — its audio and remaining
    # diffs must still build (that IS per-sample isolation), so it
    # contributes a spec dir and its remaining ENCODABLE diffs. At very
    # short --seconds the generator can legitimately emit a diff with zero
    # hit objects (the codec rejects it, isolation skips it) — only diffs
    # with objects count toward the expectation
    def encodable(text: str) -> bool:
        _, _, tail = text.partition("[HitObjects]")
        return any(line.strip() for line in tail.splitlines())

    expected_spec_dirs = 0
    expected_maps = 0
    kinds = ("truncated_zip", "bad_audio_bytes", "unparseable_osu", "missing_audio")
    for i in range(n):
        texts, wave, _ = make_mapset(rng, seconds=seconds)
        wav = songs_dir / "_tmp.wav"
        write_wav(wav, wave)
        osz = songs_dir / f"{i:05d}.osz"
        kind = kinds[(i // 25) % len(kinds)] if (i % 25 == 24) else None
        with zipfile.ZipFile(osz, "w") as z:
            if kind == "bad_audio_bytes":
                z.writestr("audio.wav", b"not really a wav file")
            elif kind != "missing_audio":
                z.write(wav, "audio.wav")
            for j, text in enumerate(texts):
                if kind == "unparseable_osu" and j == 0:
                    z.writestr(f"m{i}_{j}.osu", "osu file format v14\n[Garbage\x00")
                else:
                    z.writestr(f"m{i}_{j}.osu", text)
        if kind == "truncated_zip":
            data = osz.read_bytes()
            osz.write_bytes(data[: len(data) // 3])
        if kind is None:
            healthy += 1
            expected_spec_dirs += 1
            expected_maps += sum(encodable(t) for t in texts)
        else:
            corrupt[kind] = corrupt.get(kind, 0) + 1
            if kind == "unparseable_osu":
                expected_spec_dirs += 1
                expected_maps += sum(encodable(t) for t in texts[1:])
        wav.unlink(missing_ok=True)
    return {
        "healthy": healthy,
        "corrupt": corrupt,
        "expected_spec_dirs": expected_spec_dirs,
        "expected_maps": expected_maps,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mapsets", type=int, default=300)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--outdir", type=Path, default=Path("/tmp/ingest_stress"))
    ap.add_argument("--keep", action="store_true", help="keep outputs")
    args = ap.parse_args()

    from click.testing import CliRunner

    from osu_dreamer_tpu.cli.commands import generate_data

    out = args.outdir
    if out.exists():
        shutil.rmtree(out)
    songs = out / "Songs"
    data = out / "data"

    t0 = time.time()
    pop = build_osz_library(songs, args.mapsets, args.seconds, seed=0)
    log(f"library: {args.mapsets} mapsets ({pop['healthy']} healthy, "
        f"{sum(pop['corrupt'].values())} corrupted) in {time.time() - t0:.0f}s")

    runner = CliRunner()
    t0 = time.time()
    res = runner.invoke(
        generate_data,
        ["--songs-dir", str(songs), "--data-dir", str(data)],
        catch_exceptions=False,
    )
    dt = time.time() - t0
    assert res.exit_code == 0, res.output[-2000:]

    spec_dirs = [d for d in data.iterdir() if (d / "spec.npy").exists()]
    n_maps = sum(len(list(d.glob("*.map.npy"))) for d in spec_dirs)
    # rerun must be incremental (everything hash-keyed already on disk)
    t1 = time.time()
    res2 = runner.invoke(
        generate_data,
        ["--songs-dir", str(songs), "--data-dir", str(data)],
        catch_exceptions=False,
    )
    rerun_s = time.time() - t1
    assert res2.exit_code == 0

    result = {
        "metric": "ingest mapsets/min at corpus scale",
        "value": round(args.mapsets / dt * 60.0, 1),
        "mapsets": args.mapsets,
        "healthy": pop["healthy"],
        "corrupted": pop["corrupt"],
        "built_spec_dirs": len(spec_dirs),
        "built_maps": n_maps,
        "wall_s": round(dt, 1),
        "maps_per_min": round(n_maps / dt * 60.0, 1),
        "incremental_rerun_s": round(rerun_s, 1),
        "expected_spec_dirs": pop["expected_spec_dirs"],
        "expected_maps": pop["expected_maps"],
        # exact: every buildable mapset built a spec dir and every
        # buildable diff built a map — no slack for silently-lost healthy
        # mapsets hiding behind partially-built corrupt ones
        "error_isolation_ok": (
            len(spec_dirs) == pop["expected_spec_dirs"]
            and n_maps == pop["expected_maps"]
        ),
    }
    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(out, ignore_errors=True)
    if not result["error_isolation_ok"]:
        log(f"FAIL: built {len(spec_dirs)}/{pop['expected_spec_dirs']} spec "
            f"dirs, {n_maps}/{pop['expected_maps']} maps")
        sys.exit(1)


if __name__ == "__main__":
    main()

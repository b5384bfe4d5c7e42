"""Collect a finished quality_run's training curves + metrics into the repo.

Reads the TensorBoard event files under <outdir>/runs/<stage>/tb, exports
every scalar track to one compact JSON per stage (committable, reviewable —
raw event files are noisy binaries), and copies the run's final metrics
JSON. The result under benchmarks/convergence_r4/ is the round-4 scaled
offline convergence study (VERDICT r3 item 2).

Usage: python benchmarks/collect_convergence.py /root/qr_full [--dest DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def export_stage(tb_dir: Path) -> dict:
    from tensorboardX.event_file_writer import EventFileWriter  # noqa: F401 (presence check)

    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except ImportError:  # tensorboard not installed: parse with tensorboardX's reader
        EventAccumulator = None

    tracks: dict[str, list] = {}
    if EventAccumulator is not None:
        acc = EventAccumulator(str(tb_dir), size_guidance={"scalars": 0})
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            tracks[tag] = [[e.step, e.value] for e in acc.Scalars(tag)]
        return tracks

    # fallback: raw protobuf walk via tensorboardX's proto definitions
    from tensorboardX.proto import event_pb2
    from tensorboardX.record_writer import masked_crc32c  # noqa: F401
    import struct

    for f in sorted(tb_dir.glob("events.out.tfevents.*")):
        data = f.read_bytes()
        pos = 0
        while pos + 12 <= len(data):
            (length,) = struct.unpack("<Q", data[pos : pos + 8])
            pos += 12
            payload = data[pos : pos + length]
            pos += length + 4
            ev = event_pb2.Event()
            try:
                ev.ParseFromString(payload)
            except Exception:
                continue
            for v in ev.summary.value:
                if v.HasField("simple_value"):
                    tracks.setdefault(v.tag, []).append([ev.step, v.simple_value])
    return tracks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", type=Path)
    ap.add_argument("--dest", type=Path,
                    default=Path(__file__).parent / "convergence_r4")
    args = ap.parse_args()

    dest = args.dest
    dest.mkdir(parents=True, exist_ok=True)

    for stage in ("latent", "denoiser", "style"):
        tb = args.outdir / "runs" / stage / "tb"
        if not tb.exists():
            print(f"skip {stage}: no tb dir", file=sys.stderr)
            continue
        tracks = export_stage(tb)
        (dest / f"{stage}_curves.json").write_text(json.dumps(tracks))
        best_meta = args.outdir / "runs" / stage / "best" / "meta.json"
        if best_meta.exists():
            meta = json.loads(best_meta.read_text())
            meta.pop("hparams", None)  # config.yml already records these
            (dest / f"{stage}_best.json").write_text(json.dumps(meta))
        n = sum(len(v) for v in tracks.values())
        print(f"{stage}: {len(tracks)} tracks, {n} points", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Star-rating cross-validation harness vs rosu-pp (VERDICT r2 item 7).

The reference labels its corpus with rosu-pp's current-algorithm star rating
(reference osu_dreamer/osu/beatmap.py:67-75). This framework ships a
first-party two-skill classic-model calculator (osu_dreamer_tpu/osu/
difficulty.py + native C++), calibrated offline against an archetype suite —
this harness quantifies its bias against rosu itself on REAL maps.

It needs things this build environment does not have (network egress and/or
a rosu-pp install), so it is a one-command tool for any egress host:

    pip install rosu-pp-py
    python benchmarks/sr_crossval.py --osu-dir ~/osu/Songs      # local maps
    python benchmarks/sr_crossval.py --download 50              # fetch ranked maps

Reports one JSON line: n maps, Pearson/Spearman correlation, mean/median
signed bias (ours - rosu), MAE, and band accuracy (fraction of maps whose
our-sr lands in the same 1-star band as rosu's). Exit 1 if correlation
< --min-corr (default .9) so it can gate CI on an egress host.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def rosu_sr(path: Path) -> float | None:
    try:
        import rosu_pp_py as rosu
    except ImportError as e:  # pragma: no cover - egress-host dependency
        raise SystemExit(
            "rosu-pp-py is not installed. This harness needs an egress host: "
            "pip install rosu-pp-py"
        ) from e
    try:
        beatmap = rosu.Beatmap(path=str(path))
        if beatmap.mode != rosu.GameMode.Osu:
            return None
        return float(rosu.Difficulty().calculate(beatmap).stars)
    except Exception:
        return None


def ours_sr(path: Path) -> float | None:
    from osu_dreamer_tpu.osu import Beatmap
    from osu_dreamer_tpu.osu.difficulty import star_rating

    try:
        return float(star_rating(Beatmap(path.read_text(encoding="utf-8",
                                                        errors="replace"))))
    except Exception:
        return None


def download_ranked(n: int, outdir: Path) -> list[Path]:  # pragma: no cover
    """fetch ranked .osu files via the public catboy.best mirror (no auth).
    Egress-host only."""
    import urllib.request

    outdir.mkdir(parents=True, exist_ok=True)
    got: list[Path] = []
    # search pages of ranked std sets, then fetch each difficulty file
    page = 0
    while len(got) < n and page < 40:
        url = (f"https://catboy.best/api/v2/search?mode=0&status=1"
               f"&limit=50&offset={page * 50}")
        with urllib.request.urlopen(url, timeout=30) as r:
            sets = json.load(r)
        for s in sets:
            for child in s.get("beatmaps", []):
                if len(got) >= n:
                    break
                bid = child["id"]
                dest = outdir / f"{bid}.osu"
                if not dest.exists():
                    with urllib.request.urlopen(
                        f"https://catboy.best/osu/{bid}", timeout=30
                    ) as r:
                        dest.write_bytes(r.read())
                got.append(dest)
        page += 1
    return got


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--osu-dir", type=Path, default=None,
                    help="directory tree of .osu files to score")
    ap.add_argument("--download", type=int, default=0,
                    help="fetch this many ranked maps to --cache first")
    ap.add_argument("--cache", type=Path, default=Path("/tmp/sr_crossval_maps"))
    ap.add_argument("--limit", type=int, default=500)
    ap.add_argument("--min-corr", type=float, default=0.9)
    args = ap.parse_args()

    files: list[Path] = []
    if args.download:
        files += download_ranked(args.download, args.cache)
    if args.osu_dir:
        files += sorted(args.osu_dir.rglob("*.osu"))
    if not files:
        raise SystemExit("no maps: pass --osu-dir and/or --download N")
    files = files[: args.limit]

    rows = []
    for f in files:
        r, o = rosu_sr(f), ours_sr(f)
        if r is None or o is None or r <= 0:
            continue
        rows.append((f.name, r, o))
    if len(rows) < 5:
        raise SystemExit(f"only {len(rows)} maps scored by both calculators")

    rosu_v = np.array([r for _, r, _ in rows])
    ours_v = np.array([o for _, _, o in rows])
    diff = ours_v - rosu_v

    def spearman(a, b):
        ra, rb = np.argsort(np.argsort(a)), np.argsort(np.argsort(b))
        return float(np.corrcoef(ra, rb)[0, 1])

    pearson = float(np.corrcoef(rosu_v, ours_v)[0, 1])
    result = {
        "n_maps": len(rows),
        "pearson": round(pearson, 4),
        "spearman": round(spearman(rosu_v, ours_v), 4),
        "bias_mean": round(float(diff.mean()), 3),
        "bias_median": round(float(np.median(diff)), 3),
        "mae": round(float(np.abs(diff).mean()), 3),
        "band_accuracy": round(
            float((np.floor(rosu_v) == np.floor(ours_v)).mean()), 3
        ),
        "rosu_range": [round(float(rosu_v.min()), 2), round(float(rosu_v.max()), 2)],
    }
    print(json.dumps(result))
    if pearson < args.min_corr:
        print(f"FAIL: pearson {pearson:.3f} < {args.min_corr}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Offline label-adherence chain probes (VERDICT r4 item 4, ROADMAP r5).

The end-to-end label loop is: requested labels -> style prior sample s ->
latent label head -> written [Difficulty]. When holdout ar_err/od_err are
bad, these two probes localize WHICH link is broken, in seconds, on CPU,
against an exported inference artifact — no TPU and no fresh training run:

1. ``prior``: sample the style prior N times at a requested label row (and
   per guidance scale), decode every sample through the latent's own label
   head. A near-point-mass spread means the prior collapsed (the r5 300-step
   prior spanned ar [6.6, 7.5]); a spread that tracks guidance means the
   conditional is alive.
2. ``encoder``: decode the CACHED real latents' s through the label head and
   report per-label MAE + correlation, plus the decode of the high-ar
   subset. This is the information ceiling: no prior can beat what s
   carries (at label weight 2, real ar>9 maps decoded to 8.53).

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
        benchmarks/label_chain_probe.py <artifact.odt> [--data-dir DIR]
        [--request 2.5,9.5,8.0,4.0,5.0] [--n 64]
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--data-dir", default=None,
                    help="preprocessed dataset with *.latent.npz caches "
                    "(enables the encoder probe)")
    ap.add_argument("--request", default="2.5,9.5,8.0,4.0,5.0")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--guidances", default="1.0,2.0,3.0")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from osu_dreamer_tpu.models.inference.artifact import load_inference

    model, params = load_inference(args.artifact)
    req = np.array([float(t) for t in args.request.split(",")], np.float32)
    out: dict = {"request": req.tolist()}

    def sample_and_decode(mdl, labels, rng, guidance):
        s = mdl.style.sample(labels, rng, 16, guidance)
        return jnp.clip(mdl.latent.predict_labels(s), 0.0, 10.0)

    # ---- probe 1: prior spread per guidance ------------------------------
    labels = jnp.asarray(np.tile(req, (args.n, 1)))
    prior = {}
    for g in (float(t) for t in args.guidances.split(",")):
        lab = np.asarray(model.apply(
            params, labels, jax.random.PRNGKey(42), g,
            method=sample_and_decode,
        ))
        prior[f"g{g:g}"] = {
            "decoded_min": np.round(lab.min(axis=0), 2).tolist(),
            "decoded_mean": np.round(lab.mean(axis=0), 2).tolist(),
            "decoded_max": np.round(lab.max(axis=0), 2).tolist(),
        }
    out["prior_probe"] = prior

    # ---- probe 2: encoder information ceiling ----------------------------
    if args.data_dir:
        files = sorted(glob.glob(f"{args.data_dir}/*/*.latent.npz"))
        S, LAB = [], []
        for f in files:
            d = np.load(f)
            S.append(d["s"])
            LAB.append(d["labels"])
        S_, LAB_ = jnp.asarray(np.stack(S)), np.stack(LAB)
        pred = np.asarray(model.apply(
            params, S_,
            method=lambda m, s: jnp.clip(m.latent.predict_labels(s), 0, 10),
        ))
        names = ["sr", "ar", "od", "cs", "hp"]
        enc = {
            "n_maps": len(files),
            "per_label_mae": dict(zip(
                names, np.round(np.abs(pred - LAB_).mean(axis=0), 3).tolist()
            )),
            "per_label_corr": dict(zip(names, [
                round(float(np.corrcoef(pred[:, i], LAB_[:, i])[0, 1]), 3)
                for i in range(5)
            ])),
            "decoded_range": dict(zip(names, [
                [round(float(pred[:, i].min()), 2),
                 round(float(pred[:, i].max()), 2)] for i in range(5)
            ])),
        }
        hi = LAB_[:, 1] > 9.0
        if hi.any():
            enc["true_ar_gt9_decodes_to"] = round(float(pred[hi, 1].mean()), 2)
        out["encoder_probe"] = enc

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

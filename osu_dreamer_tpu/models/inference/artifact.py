"""Inference artifact: flatten three training checkpoints into one file.

Capability parity with reference models/inference/artifact.py: the latent
model's live weights plus the EMA weights of the denoiser and style models,
with the hyperparameters needed to rebuild the composed LDM — one portable
file (msgpack: hparams JSON + flax param pytree) instead of a torch pickle.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import jax.numpy as jnp
from flax import serialization

from osu_dreamer_tpu.utils import dataclass_from_dict

from .model import LDM, LDMArgs

ARTIFACT_VERSION = 1


def build_artifact_bytes(hparams: LDMArgs, ldm_params: Any) -> bytes:
    payload = {
        "version": ARTIFACT_VERSION,
        "hparams": json.dumps(dataclasses.asdict(hparams)),
        "params": serialization.msgpack_serialize(
            serialization.to_state_dict(ldm_params)
        ),
    }
    return serialization.msgpack_serialize(payload)


def _to_half(tree: Any) -> Any:
    """cast fp32 leaves to bf16 (inference computes in bf16 anyway; halves
    the artifact)"""
    import jax
    import numpy as np

    import jax.numpy as jnp

    def cast(x):
        arr = np.asarray(x)
        return arr.astype(jnp.bfloat16) if arr.dtype == np.float32 else arr

    return jax.tree.map(cast, tree)


def save_inference(
    latent_ckpt_path: str | Path,
    denoiser_ckpt_path: str | Path,
    style_ckpt_path: str | Path,
    output_path: str | Path,
    half: bool = False,
) -> None:
    """merge three training checkpoints (latent live weights, denoiser EMA,
    style EMA) into a single inference artifact; ``half`` stores bf16"""
    from osu_dreamer_tpu.train.checkpoint import load_train_checkpoint

    latent = load_train_checkpoint(latent_ckpt_path)
    denoiser = load_train_checkpoint(denoiser_ckpt_path)
    style = load_train_checkpoint(style_ckpt_path)

    hparams = LDMArgs(
        latent=dataclass_from_dict(
            type(LDMArgs().latent), latent.hparams["model"]
        ),
        diffusion=dataclass_from_dict(
            type(LDMArgs().diffusion), denoiser.hparams["model"]
        ),
        style=dataclass_from_dict(type(LDMArgs().style), style.hparams["model"]),
    )

    ldm_params = {
        "params": {
            "latent": latent.params["params"],
            "diffusion": (denoiser.ema_params or denoiser.params)["params"],
            "style": (style.ema_params or style.params)["params"],
        }
    }
    if half:
        ldm_params = _to_half(ldm_params)

    with open(output_path, "wb") as f:
        f.write(build_artifact_bytes(hparams, ldm_params))


def load_inference(model_path: str | Path) -> tuple[LDM, Any]:
    """-> (LDM module, parameter pytree).

    Compute dtype follows the backend: bf16 on accelerators (native MXU
    support), fp32 on CPU, where XLA emulates bf16 matmuls ~1.4x slower
    than fp32. Weights keep their stored dtype either way."""
    import jax

    with open(model_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if payload.get("version") != ARTIFACT_VERSION:
        raise ValueError(f"unsupported artifact version {payload.get('version')}")

    hparams = dataclass_from_dict(LDMArgs, json.loads(payload["hparams"]))
    params = serialization.msgpack_restore(payload["params"])
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    return LDM(hparams, dtype=dtype), params

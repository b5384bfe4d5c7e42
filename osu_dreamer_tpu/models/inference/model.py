"""Composed three-stage inference pipeline.

Capability parity with reference models/inference/model.py (LDM.sample):
encode audio once -> sample style from labels -> sample latents by sphere
tracing -> decode chart + labels with the audio skips, cropped to the
original length. The whole chain after the host-side spectrogram is a single
jitted device program; batching over difficulty vectors broadcasts the
audio encoding (#B semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from osu_dreamer_tpu.models.diffusion import DiffusionModel, DiffusionModelArgs
from osu_dreamer_tpu.models.latent import LatentModel, LatentModelArgs
from osu_dreamer_tpu.models.style import StyleModel, StyleModelArgs


@dataclass
class LDMArgs:
    latent: LatentModelArgs = field(default_factory=LatentModelArgs)
    style: StyleModelArgs = field(default_factory=StyleModelArgs)
    diffusion: DiffusionModelArgs = field(default_factory=DiffusionModelArgs)


class LDM(nn.Module):
    args: LDMArgs
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.latent = LatentModel(self.args.latent, self.dtype, name="latent")
        self.style = StyleModel(self.args.style, self.dtype, name="style")
        self.diffusion = DiffusionModel(self.args.diffusion, self.dtype, name="diffusion")

    def __call__(
        self,
        spec: jnp.ndarray,      # (S, Lpad, A_DIM) — audio, already chunk-padded
        labels: jnp.ndarray,    # (D, NUM_LABELS)
        rng: jax.Array,
        num_steps: int,
        style_steps: int = 16,
        style_guidance: float = 1.0,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """-> ((S*D, Lpad, X_DIM) chart signal, (S*D, NUM_LABELS) predicted
        labels), rows ordered song-major (song 0's D diffs first).

        S == 1 (the reference's predict shape) keeps the broadcast path —
        the audio encoding is computed once and #B-broadcast over the D
        difficulty rows. S > 1 batches SONGS through one device program
        (bulk generation: the models are small, so per-song dispatch leaves
        the chip idle); each (song, diff) pair gets its own style sample.

        ``labels`` may instead be (S, D, NUM_LABELS): per-song difficulty
        rows, used by the serving path (serve/service.py) to batch requests
        with DIFFERENT conditioning through one device program. (D, ...) is
        the shared-conditioning broadcast the predict CLI uses."""
        rng_style, rng_z = jax.random.split(rng)

        S = spec.shape[0]
        skips, h = self.latent.encode_audio(spec)
        per_song = labels.ndim == 3
        D = labels.shape[1] if per_song else labels.shape[0]
        if per_song:
            labels = labels.reshape(S * D, labels.shape[-1])
        elif S > 1:
            labels = jnp.tile(labels, (S, 1))                 # (S*D, 5)
        if S > 1:
            h = jnp.repeat(h, D, axis=0)                      # (S*D, l, A)
            skips = [jnp.repeat(sk, D, axis=0) for sk in skips]
        s = self.style.sample(labels, rng_style, style_steps, style_guidance)
        z = self.diffusion.sample(h, s, rng_z, num_steps)
        chart, out_labels = self.latent.decode(z, s, skips=skips)
        return chart, out_labels

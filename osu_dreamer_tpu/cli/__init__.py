"""The CLI (``python -m osu_dreamer_tpu <command>``): the reference's seven
commands surface-identical — generate-data, fit-latent, encode-latents,
fit-denoiser, fit-style, export-inference, predict — plus ``serve``, a
resident batching HTTP generation service (beyond the reference)."""

from __future__ import annotations

import os

# persistent XLA compile cache shared across CLI invocations: without it
# every `predict` pays the full pipeline compile (minutes on TPU) again.
# Set at MODULE import — jax snapshots this env var when it is imported,
# and the command bodies import jax lazily, after this module loads.
# setdefault: an explicit JAX_COMPILATION_CACHE_DIR wins.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "osu_dreamer_tpu", "jax",
    ),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import click

from .commands import (
    encode_latents,
    export_inference_cmd,
    fit_denoiser,
    fit_latent,
    fit_style,
    generate_data,
    predict,
    serve,
)


@click.group()
def main():
    """osu!dreamer-tpu: generate osu!standard beatmaps from raw audio."""


main.add_command(generate_data)
main.add_command(fit_latent)
main.add_command(encode_latents)
main.add_command(fit_denoiser)
main.add_command(fit_style)
main.add_command(export_inference_cmd)
main.add_command(predict)
main.add_command(serve)

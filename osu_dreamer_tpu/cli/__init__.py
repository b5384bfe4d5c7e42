"""The CLI (``python -m osu_dreamer_tpu <command>``): the reference's seven
commands surface-identical — generate-data, fit-latent, encode-latents,
fit-denoiser, fit-style, export-inference, predict — plus ``serve``, a
resident batching HTTP generation service (beyond the reference)."""

from __future__ import annotations

# persistent XLA compile cache shared across CLI invocations: without it
# every `predict` pays the full pipeline compile (~20 s) again. This must
# handle the case where a TPU-plugin sitecustomize imported jax BEFORE this
# module (env vars alone are snapshotted too early there — measured: the
# cache dir was never created and every invocation recompiled).
from osu_dreamer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import click  # noqa: E402

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

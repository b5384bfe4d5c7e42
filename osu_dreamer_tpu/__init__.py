"""osu!dreamer-tpu: a TPU-native (JAX/XLA/Pallas) framework for generating
osu!standard beatmaps from raw audio.

Three-stage latent generative pipeline (capability parity with the reference
implementation jaswon/osu-dreamer, rebuilt TPU-first):

  stage 1  ``models.latent``     chart WAE: dense 9-ch beatmap signal -> latent z + style s
  stage 2  ``models.diffusion``  distance-field denoiser: noise -> z given audio + style
  stage 3  ``models.style``      difficulty-conditioned style prior: noise -> s

Layers (bottom to top):

  ``osu``       .osu file-format domain objects (parser, slider geometry, star rating)
  ``audio``     decode + resonator-bank spectrogram featurizer (MXU matmul + assoc-scan)
  ``signal``    beatmap <-> dense per-frame signal codec, .osu serializer, slider fitter
  ``nn``        JAX NN building blocks (rms-norm, SwiGLU, RoPE attention, FiLM)
  ``ops``       Pallas TPU kernels
  ``models``    the three model families + composed inference pipeline
  ``train``     train-step machinery: optax, EMA, orbax checkpoints, TensorBoard
  ``data``      dataset build + windowed input pipelines
  ``parallel``  device-mesh / sharding helpers (DP over ICI)
  ``cli``       the seven-command CLI (python -m osu_dreamer_tpu)
"""

__version__ = "0.1.0"

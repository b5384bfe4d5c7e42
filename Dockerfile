# osu!dreamer-tpu — TPU VM image (parity with the reference's Dockerfile,
# which targets a CUDA runpod base; this targets Cloud TPU hosts)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential ffmpeg && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY osu_dreamer_tpu ./osu_dreamer_tpu
COPY native ./native

# jax[tpu] pulls libtpu for Cloud TPU VMs
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e . tensorboardX datasets tqdm

RUN make -C native

ENTRYPOINT ["python", "-m", "osu_dreamer_tpu"]

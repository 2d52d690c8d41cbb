# pydreamer-tpu training image for Cloud TPU VMs / GKE TPU node pools.
# (reference ships a CUDA image; this is the TPU-native equivalent.)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make zlib1g-dev git xvfb \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# TPU-enabled jax + core deps. libtpu comes from the jax[tpu] extra.
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax chex numpy pyyaml scipy pillow matplotlib gymnasium

# Optional env SDKs are installed per-experiment:
#   pip install ale-py minigrid dm_control gym-miniworld

COPY pydreamer_tpu /app/pydreamer_tpu
COPY config /app/config
COPY scripts /app/scripts
COPY pyproject.toml README.md /app/

RUN pip install --no-cache-dir -e .

ENTRYPOINT ["python", "-m", "pydreamer_tpu.launch"]

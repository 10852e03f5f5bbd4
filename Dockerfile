# LightDiffusion-Next TPU — container image.
#
# Parity point: /root/reference/Dockerfile (CUDA/torch image with a Gradio
# healthcheck at :82-83). This image is TPU/CPU-native instead: plain
# python-slim, JAX instead of torch, no NVIDIA base. On a Cloud TPU VM,
# run with the TPU runtime mounted (see docker-compose.yml — /dev/accel*
# passthrough + privileged) and the `tpu` extra; anywhere else it serves
# on CPU (JAX_PLATFORMS=cpu) for functional use.
FROM python:3.12-slim-bookworm

ENV DEBIAN_FRONTEND=noninteractive \
    PYTHONUNBUFFERED=1 \
    PYTHONDONTWRITEBYTECODE=1

# curl is needed by the HEALTHCHECK; libgl/glib by opencv-free PIL paths is
# not required (PIL-only imaging), so the apt footprint stays minimal.
RUN apt-get update && apt-get install -y --no-install-recommends \
    curl \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# Dependency layer first for Docker cache reuse (reference Dockerfile:33).
COPY pyproject.toml .
RUN pip install --no-cache-dir --upgrade pip \
    && pip install --no-cache-dir jax flax einops numpy safetensors pillow \
        gradio huggingface_hub \
    # On a TPU VM swap the line above's jax for: pip install 'jax[tpu]' \
    #   -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
    && true

COPY lightdiffusion_next_tpu ./lightdiffusion_next_tpu
COPY pyproject.toml README.md ./
RUN pip install --no-cache-dir --no-deps .

# Asset root (checkpoints/unet/clip/vae/loras/embeddings/ESRGAN/yolos) and
# output tree are volumes; the app creates subfolders on demand
# (utils/image.py) but pre-creating them keeps first-run logs quiet.
ENV LDT_ASSET_ROOT=/data/include
RUN mkdir -p /data/include/checkpoints /data/include/clip \
    /data/include/embeddings /data/include/ESRGAN /data/include/loras \
    /data/include/unet /data/include/vae /data/include/vae_approx \
    /data/include/yolos ./output/preview

EXPOSE 7860

# Same container contract as the reference (Dockerfile:78-79): both vars
# set -> webui Docker launch mode binds 0.0.0.0 (app/webui.py:558-564).
ENV GRADIO_SERVER_NAME=0.0.0.0 \
    GRADIO_SERVER_PORT=7860

# Persistent XLA compile cache across restarts (volume-mounted) — first
# Flux/SD compile is minutes; warm restarts are seconds.
ENV LDT_XLA_CACHE=/data/xla_cache

HEALTHCHECK --interval=30s --timeout=30s --start-period=120s --retries=3 \
    CMD curl -f http://localhost:7860/ || exit 1

CMD ["python", "-m", "lightdiffusion_next_tpu.app.webui"]

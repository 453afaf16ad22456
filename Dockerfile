# xmem2_tpu images (reference Dockerfile surface, TPU-targeted).
#
# Stage 1: inference — JAX TPU wheel + the package; runs process_video.py,
#          eval.py, train.py and the Python API.
# Stage 2: gui — adds Qt libraries for interactive_demo.py.
#
# Build:  docker build --target inference -t xmem2-tpu-inference .
#         docker build --target gui -t xmem2-tpu-gui .
# Run on a TPU VM (host networking exposes the TPU runtime):
#         docker run --privileged --net host -v $PWD:/work xmem2-tpu-inference \
#             python /app/process_video.py -v /work/frames -m /work/masks -o /work/out

FROM python:3.12-slim AS inference

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    optax orbax-checkpoint einops numpy pillow opencv-python-headless \
    pandas tqdm scipy

WORKDIR /app
COPY xmem2_tpu ./xmem2_tpu
COPY process_video.py eval.py train.py main.py import_existing.py \
     merge_multi_scale.py run_experiments.py interactive_demo.py ./
COPY scripts ./scripts

# torch (CPU) only needed to convert reference .pth checkpoints
RUN pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

ENV PYTHONPATH=/app

FROM inference AS gui
RUN apt-get update && apt-get install -y --no-install-recommends \
    libgl1 libegl1 libxkbcommon0 libdbus-1-3 libfontconfig1 \
    && rm -rf /var/lib/apt/lists/*
RUN pip install --no-cache-dir PyQt5

# Deployment container for cut_detection_tpu (reference: Dockerfile — CUDA
# 10.2 base + torch; here a TPU-VM-ready Python base + JAX).
#
# Build args let the same Dockerfile target TPU VMs (default; installs
# jax[tpu]) or CPU-only smoke environments (JAX_EXTRA=cpu).
FROM python:3.12-slim-bookworm
ENV DEBIAN_FRONTEND=noninteractive

ARG JAX_EXTRA=tpu

RUN apt-get update && \
    apt-get install -y --no-install-recommends \
      build-essential \
      make \
      python3-opencv \
      ffmpeg \
      libavcodec-dev \
      libavformat-dev \
      libavutil-dev \
      libswscale-dev && \
    rm -rf /var/lib/apt/lists/* && \
    apt-get -y autoremove

WORKDIR /home

COPY ./cut_detection_tpu/ /home/cut_detection_tpu
COPY ./native/ /home/native
COPY ./segment_video.py ./setup.py /home/

# Pinned to the versions the parity suite was verified against
# (docs/PARITY.md): cv2's INTER_LINEAR fixed-point rounding is part of the
# byte-parity surface, so its pin is exact.
RUN pip install --no-cache-dir --upgrade pip && \
    pip install --no-cache-dir "jax[${JAX_EXTRA}]>=0.9.0,<0.10" \
      opencv-python-headless==5.0.0.93 "numpy>=2.0,<3" "optax>=0.2.6,<0.3" && \
    pip install --no-cache-dir -e . && \
    make -C /home/native

RUN mkdir -p sources

# Same entrypoint contract as the reference image (Dockerfile:36):
# `docker run <image> <video path under /home/sources> [flags]`.
ENTRYPOINT ["python3", "segment_video.py"]

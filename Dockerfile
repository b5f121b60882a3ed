# TPU deployment image (reference equivalents: Dockerfile + cog.yaml +
# mdm_container.sh, which target CUDA/cog; this targets Cloud TPU VMs).
#
#   docker build -t gesturediffusion-tpu .
#   docker run --privileged --network host gesturediffusion-tpu \
#       gdt-serve --model_path /ckpts/run/model000600000 --streams 4
#
# On a TPU VM the libtpu device nodes come in via --privileged; for GKE
# use the tpu resource requests instead.  The image is CPU-runnable too
# (JAX falls back) for data prep and tests.

FROM python:3.11-slim

# gcc/make: optional C data-path kernels (native/); ffmpeg: audio mux +
# mp4 export (GIF/pillow fallback without it)
RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential ffmpeg git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/gesturediffusion-tpu

# TPU wheel first (pulls the matching libtpu), then the package
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY pyproject.toml README.md ./
COPY gesturediffusion_tpu ./gesturediffusion_tpu
COPY native ./native
COPY dataset ./dataset
COPY prepare ./prepare
COPY bench.py tpu_parity_check.py ./

RUN pip install --no-cache-dir -e ".[viz]" && make -C native

# persistent XLA compile cache across container restarts (mount a volume
# at /cache to keep warm-start compiles; utils/cache.py reads this)
ENV GDT_COMPILATION_CACHE=/cache/xla

CMD ["gdt-serve", "--help"]

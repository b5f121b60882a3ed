"""gesturediffusion_tpu — TPU-native rebuild of AI-Unicamp/GestureDiffusion.

A JAX/Flax/Pallas re-design of the MDM ("Human Motion Diffusion Model")
gesture-generation stack: Gaussian diffusion core, MDM denoisers (V1/V2 with
windowed local attention + rotary embeddings), GENEA gesture / HumanML3D /
action-to-motion data pipelines, training loop, chunked autoregressive
sampling, motion editing, and evaluation harness.

Design notes (vs. the PyTorch reference):
  * All sampler loops compile to a single `lax.scan`; classifier-free
    guidance runs cond/uncond stacked along the batch axis (one forward).
  * Parallelism is GSPMD: batch ("data") axis sharding over a
    `jax.sharding.Mesh`, collectives inserted by XLA.
  * Mixed precision is native bf16 (no loss-scaling emulation).
  * Hot attention ops have Pallas TPU kernels with XLA fallbacks.
"""

__version__ = "0.1.0"

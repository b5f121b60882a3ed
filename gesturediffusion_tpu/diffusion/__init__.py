"""Gaussian diffusion core (L1): schedules, pure-function process math,
scan-compiled samplers, timestep resamplers."""

from gesturediffusion_tpu.diffusion.gaussian import (  # noqa: F401
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    create_diffusion,
)

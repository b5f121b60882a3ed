"""Seeding (reference: utils/fixseed.py).  JAX randomness is explicit-key,
so this only pins python/numpy RNG used by data shuffling and host code."""

import random

import numpy as np


def fixseed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)

"""Sampling CLIs (L5): chunked autoregressive generation, motion editing."""

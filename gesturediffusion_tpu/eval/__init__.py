"""Evaluation harness (L6): metric math, frozen evaluator networks,
benchmark drivers."""

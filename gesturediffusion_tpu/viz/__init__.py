"""Visualization / export (L7): BVH IO, stick-figure animation."""

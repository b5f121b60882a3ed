"""Pure-function geometry and signal-processing kernels (L0 of the stack)."""

"""Live serving surface: incremental chunked-AR gesture generation."""

from gesturediffusion_tpu.serve.streaming import (  # noqa: F401
    StreamingGestureSession,
    StreamStats,
)

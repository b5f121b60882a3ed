"""Trainer / runtime (L4): jitted GSPMD train step, TrainLoop shell,
checkpointing, experiment-tracking platforms."""

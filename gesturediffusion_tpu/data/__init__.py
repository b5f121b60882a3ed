"""Data pipelines (L3): GENEA gesture datasets, HumanML3D/KIT, a2m,
fixed-shape collation, and a threaded prefetching loader."""

"""Device-mesh / GSPMD sharding utilities (replaces the reference's
vestigial MPI/NCCL distributed shim, utils/dist_util.py)."""

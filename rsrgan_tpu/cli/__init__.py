"""Command-line entry points (train/decode, prepare, simulate, extract,
plot) mirroring the reference's scripts/ + run_*.sh layers."""

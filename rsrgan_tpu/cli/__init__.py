"""Command-line entry points (train/decode, prepare, simulate, extract,
plot, serve, resynth, score) mirroring the reference's scripts/ +
run_*.sh layers plus the beyond-reference serving/evaluation surface."""

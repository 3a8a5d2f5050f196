"""Command-line entry points (train/decode, prepare, simulate, extract,
plot, serve, resynth, score) mirroring the reference's scripts/ +
run_*.sh layers plus the beyond-reference serving/evaluation surface."""


def str2bool(v) -> bool:
    """Boolean flag parser (utils/misc.py:43-49 semantics): only
    yes/true/t/1 (case-insensitive) are truthy; everything else is False.
    Shared by every CLI so falsy spellings behave consistently."""
    return str(v).lower() in ("yes", "true", "t", "1")

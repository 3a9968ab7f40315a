"""Training runtime: jitted steps, epoch loops, checkpoints, metrics."""

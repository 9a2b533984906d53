"""Training engine: optimizer partitioning, jitted train/eval steps, state."""

"""I/O, config, metrics, and checkpointing utilities."""

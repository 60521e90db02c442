"""Multi-chip SPMD over jax.sharding meshes (no reference analogue — the
reference is single-GPU; SURVEY §5.8 defines the TPU scale-out design)."""

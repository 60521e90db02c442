"""Scene data model, asset loaders, and the BVH builder (layers L2/L5/L6)."""

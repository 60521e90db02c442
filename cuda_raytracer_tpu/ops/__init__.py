"""Ray kernels and numeric primitives (reference layers L1/L3)."""

"""Pallas TPU kernels for the hot paths (flash prefill attention, fused
decode attention).  Import lazily — kernels require jax.experimental.pallas."""

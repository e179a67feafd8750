"""Pure-JAX / Pallas compute kernels operating on canonical frame planes."""

"""TPU compute ops: recurrences, loss lattices (pure-JAX and Pallas), masking."""

"""Pure, vectorized batch kernels (numpy / pyarrow.compute only).

No Ray imports here: every function maps ndarray -> ndarray and is
usable inside ``map_batches`` bodies, in tests, and in driver-side
oracles.
"""

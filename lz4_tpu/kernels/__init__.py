"""T1 kernel layer: pure-JAX batched codecs and Pallas TPU kernels."""

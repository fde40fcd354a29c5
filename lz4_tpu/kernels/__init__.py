"""T1 kernel layer: pure-JAX batched codecs and Pallas TPU kernels."""

from ..utils.config import configure_jax_cache

configure_jax_cache()

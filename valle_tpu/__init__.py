"""tpu-valle: a TPU-native VALL-E framework in JAX/XLA/Pallas."""

__version__ = "0.1.0"

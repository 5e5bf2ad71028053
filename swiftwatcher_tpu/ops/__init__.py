"""TPU-native image/tracking ops (JAX/XLA/Pallas)."""

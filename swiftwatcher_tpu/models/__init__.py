"""Neural models: SqueezeNet 1.0 segment classifier (inference + training)."""

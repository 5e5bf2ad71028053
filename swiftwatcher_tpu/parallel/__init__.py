"""Multi-chip execution: meshes, sharded window pipeline, sharded training."""

"""map_batches stages: stateless Arrow kernels + stateful actor classes."""

"""chimera_st_tpu: a TPU-native (JAX/XLA/Pallas/pjit) speech-to-text translation
framework with the capabilities of Chimera-ST (Glaciohound/Chimera-ST).

The compute path is JAX/XLA with Pallas kernels for hot ops; the host runtime
(batching, BLEU counting, alignment) has native C++ fast paths. Scale-out is
SPMD over a `jax.sharding.Mesh` (data/model axes) instead of NCCL DDP.
"""

__version__ = "0.1.0"

"""attentive_dfprior_tpu — a TPU-native neural-implicit RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MachinePerceptionLab/Attentive_DFPrior (NeurIPS 2023, "Learning Neural Implicit
through Volume Rendering with Attentive Depth Fusion Priors").

Architecture (TPU-first, not a port):
  - Pure-functional scene state (`models.scene.SceneParams`): hierarchical
    feature grids + MLP decoder parameters as one pytree.
  - jit-compiled render / mapping / tracking step functions with static stage
    dispatch and fixed shapes (where-masking replaces the reference's boolean
    gathers).
  - Host-side orchestration (alternating strict-sync loop) instead of the
    reference's two CUDA-shared-memory processes (ref: src/DF_Prior.py:297-311).
  - Data parallelism over the ray axis via jax.sharding / shard_map, gradients
    combined with psum (the reference is single-GPU; ref SURVEY §2.3).
  - TSDF fusion as a vectorized/jit device kernel instead of the reference's
    embedded CUDA kernel (ref: src/fusion.py:69-144).
"""

__version__ = "0.1.0"

"""uvhand_tpu: TPU-native hand-object 3D pose estimation framework.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of the
UVHand reference (Deformable-DETR / DINO hand-object pose estimation on
ARCTIC-style data): multi-scale deformable attention, MANO / articulated
object geometry, Hungarian-matched DETR criterion, temporal smoothing,
and SPMD training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

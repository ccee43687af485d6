"""dynosam_tpu: a TPU-native dynamic-object SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
ACFR-RPG/DynoSAM (T-RO 2025 / RA-L 2025): simultaneous estimation of the
camera trajectory, per-object SE(3) motions and poses, and static + dynamic
maps from RGB-D / stereo streams, with full-batch, sliding-window, and
incremental optimization backends.

Architecture (TPU-first, not a translation of the reference's
thread/queue/virtual-class design):
  * frontend: a pure functional, jitted step
      (TrackerState, FrameInputs) -> (TrackerState, VisionPacket)
    over fixed-capacity padded track tables.
  * backend: batched Gauss-Newton / Levenberg-Marquardt over explicit
    block-sparse factor arrays with Schur-complement landmark elimination;
    objects form a padded batch dimension (vmap replaces TBB).
  * parallel: sharding over objects / sequences via jax.sharding.Mesh.
"""

__version__ = "0.1.0"

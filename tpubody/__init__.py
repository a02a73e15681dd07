"""tpubody — a TPU-native (JAX/XLA/Pallas/pjit) single-image clothed 3D human
body reconstruction framework.

Re-designed from scratch with the capabilities of
``bokchoy-mian/3D-human-body-reconstruction`` (reference mounted read-only at
``/root/reference``): SMPL/SMPLH body models, HMR regression, SMPLify-X style
keypoint fitting, normal-map rendering, silhouette warping, normal→depth
integration, depth→mesh stitching, inverse-LBS rigging, hand replacement and
AMASS/Mixamo animation — all built TPU-first on jit/vmap/shard_map with Pallas
kernels for the hot paths.
"""

__version__ = "0.1.0"

"""tpubody — a TPU-native (JAX/XLA/Pallas/pjit) single-image clothed 3D human
body reconstruction framework.

Re-designed from scratch with the capabilities of
``bokchoy-mian/3D-human-body-reconstruction`` (reference mounted read-only at
``/root/reference``): SMPL/SMPLH body models, HMR regression, SMPLify-X style
keypoint fitting, normal-map rendering, silhouette warping, normal→depth
integration, depth→mesh stitching, inverse-LBS rigging, hand replacement and
AMASS/Mixamo animation — all built TPU-first on jit/vmap/shard_map with Pallas
kernels for the hot paths.

Quick API tour (see ARCHITECTURE.md / COMPONENTS.md for the full map)::

    from tpubody.models import params, smpl, hmr
    from tpubody.pipelines import reconstruct, gen_smplh, animate, hmr_infer
    from tpubody.fit import smplify
    from tpubody.mesh import rigging

    model = params.load("smpl_neutral.pkl")      # or params.synthetic()
    verts = smpl.forward_batch_verts(model, poses, beta)   # Pallas on TPU
"""

__version__ = "0.1.0"

__all__ = [
    "core", "models", "render", "image", "solve", "mesh", "fit", "dist",
    "io", "pipelines", "utils", "native", "cli",
]

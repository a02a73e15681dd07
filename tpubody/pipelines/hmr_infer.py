"""HMR single-image inference pipeline (BASELINE config 2).

Image(s) -> scale_and_crop 224 -> HMR (ResNet-50 + IEF) -> SMPL LBS ->
posed meshes + weak-perspective cameras, all in one jitted XLA program per
batch.  Frames/images are the parallel axis: with a device mesh the batch
shards over chips (tpubody.dist).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpubody.image import ops as image_ops
from tpubody.models import hmr as hmr_lib
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib
from tpubody.render import camera as camera_lib


class HMRInferenceResult(NamedTuple):
    verts: jnp.ndarray      # (B, V, 3)
    rotmats: jnp.ndarray    # (B, 24, 3, 3)
    shape: jnp.ndarray      # (B, 10)
    cam: jnp.ndarray        # (B, 3) weak perspective
    cam_t: jnp.ndarray      # (B, 3) full translation


class HMRPredictor:
    """Holds the HMR variables + SMPL model; ``__call__`` is jitted."""

    def __init__(self,
                 smpl_model: Optional[params_lib.BodyModelParams] = None,
                 variables=None,
                 dtype=jnp.bfloat16,
                 focal_length: float = 5000.0,
                 img_size: int = 224):
        # When a checkpoint's variables are supplied, skip the real (XLA-
        # compiled) init entirely — only the module is needed.
        self.model, default_vars = hmr_lib.create_hmr(
            dtype=dtype, init="shape" if variables is not None else "real")
        if variables is None:
            import sys
            print("WARNING: HMR running with RANDOM-INIT weights — load "
                  "a checkpoint (load_torch_checkpoint / restore) for "
                  "meaningful predictions.", file=sys.stderr)
            variables = default_vars
        self.variables = variables
        # Prefer a real SMPL model over the synthetic stand-in so exported
        # meshes use real template/skinning (warns on fallback).
        self.smpl = smpl_model or params_lib.load_or_synthetic(
            "smpl", n_joints=24, n_verts=6890, seed=0)
        self.focal_length = focal_length
        self.img_size = img_size

        @jax.jit
        def _run(variables, images):
            out = self.model.apply(variables, images)
            state = smpl_lib.forward_batch(
                self.smpl, out.rotmats, out.shape, None, pose_is_rotmat=True)
            cam_t = camera_lib.weak_perspective_translation(
                out.cam, focal_length, img_size)
            return HMRInferenceResult(
                verts=state.verts, rotmats=out.rotmats, shape=out.shape,
                cam=out.cam, cam_t=cam_t)
        self._run = _run

    def __call__(self, images: jnp.ndarray) -> HMRInferenceResult:
        """images: (B, 224, 224, 3) normalized float32."""
        return self._run(self.variables, images)

    def from_files(self, paths: Sequence[str],
                   centers=None, scales=None) -> HMRInferenceResult:
        """Read, crop (center-crop by default), normalize, and infer."""
        crops = []
        for i, p in enumerate(paths):
            img = image_ops.read_image(p)
            H, W = img.shape[:2]
            center = (centers[i] if centers is not None
                      else np.array([W / 2, H / 2]))
            scale = (scales[i] if scales is not None
                     else max(H, W) / 200.0)
            crops.append(image_ops.scale_and_crop(
                img, center, scale, self.img_size))
        batch = image_ops.normalize_for_hmr(np.stack(crops))
        return self(jnp.asarray(batch, jnp.float32))

    def load_torch_checkpoint(self, path: str) -> None:
        """Load a reference torch HMR checkpoint (converted)."""
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
              for k, v in sd.items()}
        self.variables = hmr_lib.convert_torch_state_dict(
            sd, hmr_lib.default_mean_params())

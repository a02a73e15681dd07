"""VPoser: variational pose prior (encoder/decoder MLPs) in Flax.

Architecture parity with the reference VPoser
(lib/Gen_SMPLH/vposer/vposer_smpl.py:59-164): encoder 63 -> 512 -> 512 ->
(32 mean, 32 logvar); decoder 32 -> 512 -> 512 -> 21*6 (6D rotations) ->
rotation matrices / axis-angle via the continuous rotation decoder
(:43-56 = Gram-Schmidt on the two 3-vectors).

``convert_torch_checkpoint`` maps the reference's TR00_E096.pt state dict
(bodyprior_enc_fc1/2, bodyprior_dec_fc1/2, bodyprior_dec_out, mu/logvar
layers) into Flax params so the real trained prior can drive fitting.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpubody.core.rotations import rot6d_to_rotmat, rotmat_to_axis_angle

LATENT_D = 32
N_JOINTS = 21


class VPoserDecoder(nn.Module):
    """latent (B, 32) -> rotmats (B, 21, 3, 3)."""

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.leaky_relu(nn.Dense(512, name="fc1")(z), 0.2)
        h = nn.leaky_relu(nn.Dense(512, name="fc2")(h), 0.2)
        out = nn.Dense(N_JOINTS * 6, name="out")(h)
        # The reference decoder reads the 6 numbers as the first two
        # *columns* via view(-1, 3, 2) (vposer_smpl.py:43-56), matching our
        # rot6d convention.
        return rot6d_to_rotmat(out.reshape(-1, N_JOINTS, 6)).reshape(
            z.shape[0], N_JOINTS, 3, 3)


class VPoserEncoder(nn.Module):
    """body pose aa (B, 63) -> (mean (B,32), scale (B,32)).

    Mirrors the reference encoder incl. its BatchNorm layers in inference
    mode (vposer_smpl.py:69-100: bn1 -> fc1 -> leaky -> bn2 -> fc2 ->
    leaky -> mu/logvar, scale = softplus(logvar))."""

    @nn.compact
    def __call__(self, pose: jnp.ndarray):
        norm = lambda name: nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5, name=name)
        h = norm("bn1")(pose)
        h = nn.leaky_relu(nn.Dense(512, name="fc1")(h), 0.2)
        h = norm("bn2")(h)
        h = nn.leaky_relu(nn.Dense(512, name="fc2")(h), 0.2)
        mu = nn.Dense(LATENT_D, name="mu")(h)
        scale = jax.nn.softplus(nn.Dense(LATENT_D, name="logvar")(h))
        return mu, scale


def decode_to_axis_angle(decoder: VPoserDecoder, params,
                         z: jnp.ndarray) -> jnp.ndarray:
    """latent -> (B, 63) axis-angle body pose (21 joints), the fitting
    pipeline's 'aa' output type (vposer_smpl.py:101-117)."""
    rotmats = decoder.apply(params, z)
    return rotmat_to_axis_angle(rotmats).reshape(z.shape[0], N_JOINTS * 3)


def create_decoder(rng: Optional[jax.Array] = None
                   ) -> Tuple[VPoserDecoder, Any]:
    dec = VPoserDecoder()
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = dec.init(rng, jnp.zeros((1, LATENT_D)))
    return dec, params


def convert_torch_checkpoint(state_dict: dict) -> Tuple[Any, Any]:
    """torch VPoser ckpt -> (decoder_params, encoder_params).

    Expected keys (reference vposer_smpl.py:66-87):
      bodyprior_enc_fc1/fc2, bodyprior_enc_mu, bodyprior_enc_logvar,
      bodyprior_dec_fc1/fc2, bodyprior_dec_out  (.weight/.bias each).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def dense(name):
        return {"kernel": sd[name + ".weight"].T, "bias": sd[name + ".bias"]}

    dec_params = {"params": {
        "fc1": dense("bodyprior_dec_fc1"),
        "fc2": dense("bodyprior_dec_fc2"),
        "out": dense("bodyprior_dec_out"),
    }}
    def bn(name):
        return ({"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]},
                {"mean": sd[name + ".running_mean"],
                 "var": sd[name + ".running_var"]})

    bn1_p, bn1_s = bn("bodyprior_enc_bn1")
    bn2_p, bn2_s = bn("bodyprior_enc_bn2")
    enc_params = {
        "params": {
            "bn1": bn1_p, "bn2": bn2_p,
            "fc1": dense("bodyprior_enc_fc1"),
            "fc2": dense("bodyprior_enc_fc2"),
            "mu": dense("bodyprior_enc_mu"),
            "logvar": dense("bodyprior_enc_logvar"),
        },
        "batch_stats": {"bn1": bn1_s, "bn2": bn2_s},
    }
    return dec_params, enc_params


def load_torch_checkpoint(path: str) -> Tuple[Any, Any]:
    """Load a .pt VPoser snapshot via torch (CPU) and convert."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    return convert_torch_checkpoint(sd)

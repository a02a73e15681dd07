"""Body-model parameter containers and loaders.

The reference loads SMPL/SMPLH parameter pickles at runtime
(models/smpl_np.py:123-139, models/smplh_np.py:7-23).  Those binary assets
are stripped from the reference checkout (``.MISSING_LARGE_BLOBS``), so this
module supports three sources:

  1. the original pickle format (``J_regressor``, ``weights``, ``shapedirs``,
     ``posedirs``, ``v_template``, ``f``, ``kintree_table``), including
     scipy-sparse regressors and chumpy arrays,
  2. an ``.npz`` cache we write once after conversion (fast, no pickle),
  3. a deterministic *synthetic* model with the same tensor shapes and a
     valid kinematic tree, used by the test-suite and benchmarks when real
     assets are absent.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# SMPL (24-joint) kinematic tree: parents[i] for joint i; root = -1.
SMPL_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    20, 21,
)

# SMPLH (52-joint) tree: body 22 + left hand 15 (wrist 20) + right hand 15
# (wrist 21).  Matches the standard SMPLH kintree_table layout.
SMPLH_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    # left hand (index, middle, pinky, ring, thumb chains of 3)
    20, 22, 23, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35,
    # right hand
    21, 37, 38, 21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50,
)

SMPL_NUM_VERTS = 6890
SMPL_NUM_FACES = 13776


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BodyModelParams:
    """Pytree of SMPL-family model tensors (device arrays).

    ``parents`` is static metadata (hashable tuple) so the kinematic tree
    stays compile-time constant; ``faces`` rides along as a pytree leaf
    (host-side consumers only).
    """

    v_template: jnp.ndarray   # (V, 3)
    shapedirs: jnp.ndarray    # (V, 3, S)
    posedirs: jnp.ndarray     # (V, 3, 9*(J-1))
    j_regressor: jnp.ndarray  # (J, V)
    weights: jnp.ndarray      # (V, J)
    parents: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    # NOTE: faces is a DATA field (pytree leaf): as static metadata the
    # numpy array breaks jit-cache equality checks (array == array is not
    # a bool) as soon as two model instances flow through one jitted
    # function.  It is only consumed host-side, outside jit.
    faces: np.ndarray = dataclasses.field(metadata=dict(static=False))
    # SMPLH hand-pose PCA bases (45, n_comps) each, or None (smplx models
    # carry hands_componentsl/r; the fitting stage optimizes num_pca_comps
    # coefficients instead of full hand axis-angle when present,
    # fit_smplh.yaml use_pca/num_pca_comps=12).
    hands_components_l: Optional[jnp.ndarray] = None
    hands_components_r: Optional[jnp.ndarray] = None
    hands_mean_l: Optional[jnp.ndarray] = None
    hands_mean_r: Optional[jnp.ndarray] = None

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    def astype(self, dtype) -> "BodyModelParams":
        return dataclasses.replace(
            self,
            v_template=self.v_template.astype(dtype),
            shapedirs=self.shapedirs.astype(dtype),
            posedirs=self.posedirs.astype(dtype),
            j_regressor=self.j_regressor.astype(dtype),
            weights=self.weights.astype(dtype),
        )


def _densify(x) -> np.ndarray:
    """Convert scipy-sparse / chumpy / numpy inputs to dense float64 numpy."""
    if hasattr(x, "toarray"):  # scipy sparse
        x = x.toarray()
    if hasattr(x, "r"):  # chumpy
        x = np.asarray(x.r)
    return np.asarray(x, dtype=np.float64)


def _parents_from_kintree(kintree_table: np.ndarray) -> Tuple[int, ...]:
    """Parent indices from a 2xJ kintree table (models/smpl_np.py:135-139)."""
    kt = np.asarray(kintree_table)
    id_to_col = {int(kt[1, i]): i for i in range(kt.shape[1])}
    parents = [-1]
    for i in range(1, kt.shape[1]):
        parents.append(id_to_col[int(kt[0, i])])
    return tuple(parents)


def load_pickle(path: str, dtype=jnp.float32) -> BodyModelParams:
    """Load a SMPL/SMPLH parameter pickle in the reference's on-disk format."""
    with open(path, "rb") as f:
        params = pickle.load(f, encoding="iso-8859-1")
    parents = _parents_from_kintree(params["kintree_table"])
    J = len(parents)
    posedirs = _densify(params["posedirs"]).reshape(-1, 3, 9 * (J - 1))
    shapedirs = _densify(params["shapedirs"])

    def opt(key):
        if key in params:
            return jnp.asarray(_densify(params[key]), dtype=dtype)
        return None

    return BodyModelParams(
        v_template=jnp.asarray(_densify(params["v_template"]), dtype=dtype),
        shapedirs=jnp.asarray(shapedirs, dtype=dtype),
        posedirs=jnp.asarray(posedirs, dtype=dtype),
        j_regressor=jnp.asarray(_densify(params["J_regressor"]), dtype=dtype),
        weights=jnp.asarray(_densify(params["weights"]), dtype=dtype),
        parents=parents,
        faces=np.asarray(params["f"], dtype=np.int32),
        hands_components_l=opt("hands_componentsl"),
        hands_components_r=opt("hands_componentsr"),
        hands_mean_l=opt("hands_meanl"),
        hands_mean_r=opt("hands_meanr"),
    )


def save_npz(path: str, model: BodyModelParams) -> None:
    np.savez_compressed(
        path,
        v_template=np.asarray(model.v_template),
        shapedirs=np.asarray(model.shapedirs),
        posedirs=np.asarray(model.posedirs),
        j_regressor=np.asarray(model.j_regressor),
        weights=np.asarray(model.weights),
        parents=np.asarray(model.parents, dtype=np.int32),
        faces=model.faces,
    )


def load_npz(path: str, dtype=jnp.float32) -> BodyModelParams:
    z = np.load(path)
    return BodyModelParams(
        v_template=jnp.asarray(z["v_template"], dtype=dtype),
        shapedirs=jnp.asarray(z["shapedirs"], dtype=dtype),
        posedirs=jnp.asarray(z["posedirs"], dtype=dtype),
        j_regressor=jnp.asarray(z["j_regressor"], dtype=dtype),
        weights=jnp.asarray(z["weights"], dtype=dtype),
        parents=tuple(int(p) for p in z["parents"]),
        faces=np.asarray(z["faces"], dtype=np.int32),
    )


def load(path: str, dtype=jnp.float32) -> BodyModelParams:
    """Load from .npz or .pkl, whichever the extension says."""
    if path.endswith(".npz"):
        return load_npz(path, dtype)
    return load_pickle(path, dtype)


def _synthetic_numpy(
    n_joints: int,
    n_verts: int,
    n_betas: int,
    seed: int,
) -> dict:
    """Deterministic synthetic SMPL-like tensors (float64 numpy).

    Builds a humanoid-ish point cloud around the joint skeleton so that
    skinning weights have realistic locality, joint regressors average nearby
    vertices, and blendshapes are small perturbations.  Used wherever the
    (stripped) real model pickles would be.
    """
    rng = np.random.default_rng(seed)
    parents = SMPL_PARENTS if n_joints == 24 else SMPLH_PARENTS
    assert len(parents) == n_joints

    # Rest skeleton: root at origin, children offset in a repeatable pattern.
    joints = np.zeros((n_joints, 3))
    for i in range(1, n_joints):
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        bone_len = 0.08 + 0.12 * rng.random()
        joints[i] = joints[parents[i]] + direction * bone_len

    # Vertices scattered around bones.
    owner = rng.integers(0, n_joints, size=n_verts)
    v_template = joints[owner] + rng.normal(scale=0.05, size=(n_verts, 3))

    # Skinning weights: softmax of negative distance to each joint (sharp).
    d = np.linalg.norm(v_template[:, None, :] - joints[None, :, :], axis=-1)
    logits = -d / 0.03
    logits -= logits.max(axis=1, keepdims=True)
    weights = np.exp(logits)
    weights /= weights.sum(axis=1, keepdims=True)

    # Joint regressor: normalized proximity weights (rows sum to 1), chosen
    # so that J_regressor @ v_template ~= joints.
    prox = np.exp(-d.T / 0.02)
    j_regressor = prox / prox.sum(axis=1, keepdims=True)

    shapedirs = rng.normal(scale=0.01, size=(n_verts, 3, n_betas))
    posedirs = rng.normal(scale=0.001, size=(n_verts, 3, 9 * (n_joints - 1)))

    # A valid (if arbitrary) triangulation over vertex indices.
    n_faces = 2 * n_verts - 4 if n_verts == SMPL_NUM_VERTS else n_verts
    faces = rng.integers(0, n_verts, size=(max(n_faces, 4), 3)).astype(np.int32)

    return dict(
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=posedirs,
        j_regressor=j_regressor,
        weights=weights,
        parents=tuple(parents),
        faces=faces,
    )


def synthetic(
    n_joints: int = 24,
    n_verts: int = 862,
    n_betas: int = 10,
    seed: int = 0,
    dtype=jnp.float32,
) -> BodyModelParams:
    """Deterministic synthetic body model (see :func:`_synthetic_numpy`)."""
    raw = _synthetic_numpy(n_joints, n_verts, n_betas, seed)
    return BodyModelParams(
        v_template=jnp.asarray(raw["v_template"], dtype=dtype),
        shapedirs=jnp.asarray(raw["shapedirs"], dtype=dtype),
        posedirs=jnp.asarray(raw["posedirs"], dtype=dtype),
        j_regressor=jnp.asarray(raw["j_regressor"], dtype=dtype),
        weights=jnp.asarray(raw["weights"], dtype=dtype),
        parents=raw["parents"],
        faces=raw["faces"],
    )


def synthetic_numpy(
    n_joints: int = 24, n_verts: int = 862, n_betas: int = 10, seed: int = 0
) -> dict:
    """Raw float64 numpy synthetic model, for oracle-side use in tests."""
    return _synthetic_numpy(n_joints, n_verts, n_betas, seed)


def default_model_path(kind: str = "smpl") -> Optional[str]:
    """Find a real model asset if one is present in the conventional spots."""
    candidates = [
        os.path.join(os.path.dirname(__file__), "assets", f"{kind}_neutral.npz"),
        os.environ.get("TPUBODY_" + kind.upper() + "_PATH", ""),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_or_synthetic(kind: str = "smpl", n_joints: int = 24,
                      n_verts: int = 6890, seed: int = 0,
                      warn: bool = True) -> BodyModelParams:
    """Resolve a real body model (conventional asset spots /
    TPUBODY_*_PATH env), falling back to a synthetic stand-in with a
    loud warning: meshes built on the synthetic template have valid
    shapes but are geometrically meaningless stand-ins."""
    # Only a full-size request can be satisfied by a real asset; smaller
    # n_verts (tests, benches) always means a synthetic model.
    path = default_model_path(kind) if n_verts == SMPL_NUM_VERTS else None
    if path:
        return load(path)
    if warn:
        import sys

        print(
            f"WARNING: no real {kind.upper()} model found "
            f"(set TPUBODY_{kind.upper()}_PATH or install "
            f"tpubody/models/assets/{kind}_neutral.npz); using a SYNTHETIC "
            f"body — exported meshes are placeholders, not real bodies.",
            file=sys.stderr)
    # Prefer the structured capsule humanoid (real limb geometry: plane
    # sections, silhouettes, and hand grafting all behave); tiny vertex
    # budgets (shape-only tests) fall back to the cheap blob.
    try:
        from tpubody.models import humanoid as humanoid_lib

        return humanoid_lib.humanoid(n_joints=n_joints, n_verts=n_verts,
                                     seed=seed)
    except ValueError:
        return synthetic(n_joints=n_joints, n_verts=n_verts, seed=seed)

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

# SMPLX (55-joint) tree: body 22 (same as SMPLH) + jaw/leye/reye under the
# head (15) + 2x15 hand chains (index, middle, pinky, ring, thumb) under the
# wrists (20/21).  Matches the standard SMPL-X kintree_table layout
# (the reference offers model_type='smplx' as a config choice,
# lib/Gen_SMPLH/smpl_config.py:84).
SMPLX_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    # jaw, left eye, right eye
    15, 15, 15,
    # left hand
    20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
    # right hand
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
)

SMPL_NUM_VERTS = 6890
SMPL_NUM_FACES = 13776
SMPLX_NUM_VERTS = 10475
NUM_FACE_LANDMARKS = 51      # static FLAME-compatible landmarks
NUM_FACE_CONTOUR = 17        # jawline contour landmarks


def parents_for(n_joints: int):
    if n_joints == 24:
        return SMPL_PARENTS
    if n_joints == 52:
        return SMPLH_PARENTS
    if n_joints == 55:
        return SMPLX_PARENTS
    raise ValueError(f"unsupported joint count {n_joints} (24, 52 or 55)")


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
    # SMPL-X face surface: expression blendshapes (V, 3, E) and the
    # barycentric face-landmark embedding (static 51 landmarks followed by
    # the 17 jawline contour points, the smplx lmk_faces_idx /
    # lmk_bary_coords convention).  Landmark tables are host-side numpy
    # (consumed once at fit setup to build vertex gathers).
    expr_dirs: Optional[jnp.ndarray] = None
    lmk_faces_idx: Optional[np.ndarray] = None     # (51[+17],) int
    lmk_bary_coords: Optional[np.ndarray] = None   # (51[+17], 3)

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    @property
    def num_expressions(self) -> int:
        return 0 if self.expr_dirs is None else self.expr_dirs.shape[-1]

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
            expr_dirs=(None if self.expr_dirs is None
                       else self.expr_dirs.astype(dtype)),
        )


def restrict_model(
    model: BodyModelParams, vert_ids
) -> Tuple[BodyModelParams, np.ndarray]:
    """Exact reduced model for fits that consume only joints + a few
    surface vertices.

    The staged SMPLify objective needs posed JOINTS plus a handful of
    surface vertices (extra "joints" like nose/ears/fingertips and the
    barycentric face-landmark vertices) — yet a naive forward pays the
    full V-vertex LBS every optimizer evaluation (measured on one v5e at
    N=64 production fits: 253 ms/frame at 6890 verts vs 69 ms/frame at
    300 — ~3/4 of fit time is vertex work whose output is discarded).

    Construction (algebraically exact, no new LBS math): the first J rows
    of the reduced vertex arrays are *virtual joint vertices* carrying the
    collapsed regression ``J_regressor @ v_template`` /
    ``J_regressor @ shapedirs`` with one-hot skinning weights, so
    ``lbs()`` regresses joints from them via an identity gather
    (J = Jr@(v_t + S·β) = Jr@v_t + (Jr@S)·β, precomputed in float64);
    the remaining rows are the requested vertex rows gathered unchanged.
    Every LBS output is exact: ``joints``/``joints_posed``/
    ``rel_transforms`` match the full model, and
    ``verts[rows[i]] == verts_full[vert_ids[i]]`` for all (pose, beta).

    SMPL-X note: fold expression dirs into ``shapedirs`` BEFORE
    restricting (as the fit setup does) — the reduced model drops
    ``expr_dirs``/landmark tables (resolve landmark gathers to vertex ids
    first and remap them through ``rows``).

    Returns ``(reduced, rows)`` with ``rows[i]`` the reduced-verts row of
    ``vert_ids[i]`` (duplicates in ``vert_ids`` share a row).
    """
    ids = np.asarray(vert_ids, np.int64).reshape(-1)
    uniq, inv = np.unique(ids, return_inverse=True)
    nj = model.num_joints
    jr = np.asarray(model.j_regressor, np.float64)
    j_template = jr @ np.asarray(model.v_template, np.float64)
    j_shapedirs = np.einsum(
        "jv,vcs->jcs", jr, np.asarray(model.shapedirs, np.float64))
    eye_j = np.eye(nj, dtype=np.float32)
    dtype = model.v_template.dtype

    def cat(head, body):
        return jnp.concatenate(
            [jnp.asarray(head, dtype), jnp.asarray(body, dtype)], axis=0)

    reduced = dataclasses.replace(
        model,
        v_template=cat(j_template, np.asarray(model.v_template)[uniq]),
        shapedirs=cat(j_shapedirs, np.asarray(model.shapedirs)[uniq]),
        posedirs=cat(
            np.zeros((nj,) + model.posedirs.shape[1:], np.float32),
            np.asarray(model.posedirs)[uniq]),
        weights=cat(eye_j, np.asarray(model.weights)[uniq]),
        j_regressor=jnp.asarray(
            np.concatenate(
                [eye_j, np.zeros((nj, uniq.size), np.float32)], axis=1),
            dtype),
        faces=np.zeros((0, 3), np.int64),
        expr_dirs=None, lmk_faces_idx=None, lmk_bary_coords=None,
    )
    return reduced, (nj + inv).astype(np.int64)


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


def load_pickle(path: str, dtype=jnp.float32, num_betas: int = 10,
                num_expressions: int = 10) -> BodyModelParams:
    """Load a SMPL/SMPLH/SMPLX parameter pickle in the reference's on-disk
    format.  SMPL-X assets pack shape and expression blendshapes into one
    (V, 3, 400) ``shapedirs`` (shape components in [:300], expression in
    [300:]) — split per the smplx convention when that layout is present."""
    with open(path, "rb") as f:
        params = pickle.load(f, encoding="iso-8859-1")
    parents = _parents_from_kintree(params["kintree_table"])
    J = len(parents)
    posedirs = _densify(params["posedirs"]).reshape(-1, 3, 9 * (J - 1))
    shapedirs = _densify(params["shapedirs"])
    expr_dirs = None
    if shapedirs.shape[-1] > 300:       # smplx packed shape+expression
        expr_dirs = shapedirs[:, :, 300:300 + num_expressions]
        shapedirs = shapedirs[:, :, :num_betas]

    def opt(key, arr=None):
        arr = params.get(key) if arr is None else arr
        if arr is not None:
            return jnp.asarray(_densify(arr), dtype=dtype)
        return None

    lmk_idx = params.get("lmk_faces_idx")
    lmk_bary = params.get("lmk_bary_coords")
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
        expr_dirs=opt("expr_dirs", expr_dirs),
        lmk_faces_idx=(None if lmk_idx is None
                       else np.asarray(lmk_idx, np.int64)),
        lmk_bary_coords=(None if lmk_bary is None
                         else np.asarray(_densify(lmk_bary))),
    )


def save_npz(path: str, model: BodyModelParams) -> None:
    extras = {}
    for key in ("hands_components_l", "hands_components_r", "hands_mean_l",
                "hands_mean_r", "expr_dirs", "lmk_faces_idx",
                "lmk_bary_coords"):
        val = getattr(model, key)
        if val is not None:
            extras[key] = np.asarray(val)
    np.savez_compressed(
        path,
        v_template=np.asarray(model.v_template),
        shapedirs=np.asarray(model.shapedirs),
        posedirs=np.asarray(model.posedirs),
        j_regressor=np.asarray(model.j_regressor),
        weights=np.asarray(model.weights),
        parents=np.asarray(model.parents, dtype=np.int32),
        faces=model.faces,
        **extras,
    )


def load_npz(path: str, dtype=jnp.float32) -> BodyModelParams:
    z = np.load(path)

    def opt(key, as_np=False):
        if key not in z.files:
            return None
        if as_np:
            return np.asarray(z[key])
        return jnp.asarray(z[key], dtype=dtype)

    return BodyModelParams(
        v_template=jnp.asarray(z["v_template"], dtype=dtype),
        shapedirs=jnp.asarray(z["shapedirs"], dtype=dtype),
        posedirs=jnp.asarray(z["posedirs"], dtype=dtype),
        j_regressor=jnp.asarray(z["j_regressor"], dtype=dtype),
        weights=jnp.asarray(z["weights"], dtype=dtype),
        parents=tuple(int(p) for p in z["parents"]),
        faces=np.asarray(z["faces"], dtype=np.int32),
        hands_components_l=opt("hands_components_l"),
        hands_components_r=opt("hands_components_r"),
        hands_mean_l=opt("hands_mean_l"),
        hands_mean_r=opt("hands_mean_r"),
        expr_dirs=opt("expr_dirs"),
        lmk_faces_idx=opt("lmk_faces_idx", as_np=True),
        lmk_bary_coords=opt("lmk_bary_coords", as_np=True),
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
    parents = parents_for(n_joints)
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

    out = dict(
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=posedirs,
        j_regressor=j_regressor,
        weights=weights,
        parents=tuple(parents),
        faces=faces,
    )
    if n_joints == 55:           # SMPL-X: expression + face landmarks
        expr_dirs = rng.normal(scale=0.005, size=(n_verts, 3, 10))
        # Concentrate expression deformation on head-owned vertices.
        head_mask = (owner == 15) | (owner == 22) | (owner == 23) | \
            (owner == 24)
        expr_dirs[~head_mask] *= 0.01
        out["expr_dirs"] = expr_dirs
        idx, bary = face_landmark_embedding(v_template, faces, joints[15],
                                            jaw_center=joints[22])
        out["lmk_faces_idx"] = idx
        out["lmk_bary_coords"] = bary
    return out


def face_landmark_embedding(v_template: np.ndarray, faces: np.ndarray,
                            head_center: np.ndarray,
                            jaw_center: Optional[np.ndarray] = None):
    """Deterministic synthetic face-landmark embedding with FLAME-like
    semantics: rows 0-30 (brows/nose/eyes) on forward-facing faces near
    the head, rows 31-50 (mouth) and the 17 jawline-contour rows on faces
    nearest the JAW, so jaw articulation actually moves the landmarks it
    moves on a real face.  Centroid barycentrics.  Real SMPL-X assets
    carry a learned embedding (lmk_faces_idx/lmk_bary_coords); this
    stand-in keeps the same contract for asset-free runs."""
    if jaw_center is None:
        jaw_center = head_center
    cent = v_template[np.asarray(faces)].mean(axis=1)

    def _pick(center, n, forward=0.0):
        score = -np.linalg.norm(cent - center, axis=1) + forward * cent[:, 2]
        order = np.argsort(-score)
        pool = order[:max(4 * n, n)]
        return pool[np.linspace(0, pool.shape[0] - 1, n).astype(int)]

    upper = _pick(head_center, 31, forward=0.5)       # brows/nose/eyes
    mouth = _pick(jaw_center, NUM_FACE_LANDMARKS - 31)  # mouth rows 31-50
    contour = _pick(jaw_center, NUM_FACE_CONTOUR)     # jawline
    sel = np.concatenate([upper, mouth, contour])
    bary = np.full((sel.shape[0], 3), 1.0 / 3.0)
    return sel.astype(np.int64), bary


def synthetic(
    n_joints: int = 24,
    n_verts: int = 862,
    n_betas: int = 10,
    seed: int = 0,
    dtype=jnp.float32,
) -> BodyModelParams:
    """Deterministic synthetic body model (see :func:`_synthetic_numpy`)."""
    raw = _synthetic_numpy(n_joints, n_verts, n_betas, seed)
    return params_from_numpy(raw, dtype=dtype)


def params_from_numpy(raw: dict, dtype=jnp.float32) -> BodyModelParams:
    """BodyModelParams from a synthetic/humanoid numpy model dict."""
    return BodyModelParams(
        v_template=jnp.asarray(raw["v_template"], dtype=dtype),
        shapedirs=jnp.asarray(raw["shapedirs"], dtype=dtype),
        posedirs=jnp.asarray(raw["posedirs"], dtype=dtype),
        j_regressor=jnp.asarray(raw["j_regressor"], dtype=dtype),
        weights=jnp.asarray(raw["weights"], dtype=dtype),
        parents=raw["parents"],
        faces=raw["faces"],
        expr_dirs=(jnp.asarray(raw["expr_dirs"], dtype=dtype)
                   if "expr_dirs" in raw else None),
        lmk_faces_idx=raw.get("lmk_faces_idx"),
        lmk_bary_coords=raw.get("lmk_bary_coords"),
    )


def synthetic_numpy(
    n_joints: int = 24, n_verts: int = 862, n_betas: int = 10, seed: int = 0
) -> dict:
    """Raw float64 numpy synthetic model, for oracle-side use in tests."""
    return _synthetic_numpy(n_joints, n_verts, n_betas, seed)


def default_model_path(kind: str = "smpl",
                       gender: str = "neutral") -> Optional[str]:
    """Find a real model asset if one is present in the conventional spots.

    ``gender`` selects a gender-specific asset first (the reference's
    --gender flag feeds smplx.create and picks SMPL(H)_{MALE,FEMALE}.pkl,
    lib/gen_smplh.py:63,90); the neutral asset and the generic env var are
    the fallback so a gendered request still resolves *something* real."""
    if gender not in ("neutral", "male", "female"):
        raise ValueError(f"gender={gender!r} (neutral, male or female)")
    assets = os.path.join(os.path.dirname(__file__), "assets")
    candidates = [
        os.path.join(assets, f"{kind}_{gender}.npz"),
        os.environ.get(f"TPUBODY_{kind.upper()}_{gender.upper()}_PATH", ""),
        os.path.join(assets, f"{kind}_neutral.npz"),
        os.environ.get("TPUBODY_" + kind.upper() + "_PATH", ""),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_or_synthetic(kind: str = "smpl", n_joints: int = 24,
                      n_verts: int = 6890, seed: int = 0,
                      warn: bool = True,
                      gender: str = "neutral") -> BodyModelParams:
    """Resolve a real body model (conventional asset spots /
    TPUBODY_*_PATH env), falling back to a synthetic stand-in with a
    loud warning: meshes built on the synthetic template have valid
    shapes but are geometrically meaningless stand-ins."""
    # Only a full-size request can be satisfied by a real asset; smaller
    # n_verts (tests, benches) always means a synthetic model.
    full_size = SMPLX_NUM_VERTS if kind == "smplx" else SMPL_NUM_VERTS
    path = default_model_path(kind, gender) if n_verts == full_size else None
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

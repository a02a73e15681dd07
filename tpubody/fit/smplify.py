"""SMPLify-X style staged fitting: OpenPose keypoints -> SMPLH parameters.

Capability parity with the reference fitting subsystem
(lib/gen_smplh.py:34-177, lib/Gen_SMPLH/fit_single_frame.py:50-546,
fitting.py:36-503), re-designed TPU-first:

  * the ENTIRE weighted-stage schedule is one jitted XLA program: a
    ``lax.scan`` over the per-stage weight schedule whose body is the full
    L-BFGS (strong-Wolfe) ``lax.while_loop`` over SMPLH forward + VPoser
    decode + losses — the reference drives hundreds of python closure
    calls through torch; here 5 stages x 2 orientation candidates share a
    single compiled executable (weights are traced scan inputs),
  * the camera-depth initialization is the reference's limb-length ratio
    heuristic (fitting.py guess_init :36-110),
  * the 180-degree orientation flip test (fit_single_frame.py:337-356)
    evaluates both candidates and keeps the lower final loss.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpubody.fit import joints as joints_lib
from tpubody.fit import keypoints as kp_lib
from tpubody.fit import priors as priors_lib
from tpubody.fit import vposer as vposer_lib
from tpubody.models import params as params_lib
from tpubody.models import smpl as smpl_lib


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Defaults from fit_smplh.yaml + smpl_config.py (SURVEY.md §2 #27)."""

    # Body family (smpl_config.py:83-84 choices).  'smplh' is the
    # reference's only live configuration (fit_smplh.yaml:17); 'smpl'
    # fits the 24-joint body-only model (23-joint 69-dim body pose, no
    # articulated hands, BODY_25 keypoints only); 'smplx' fits the
    # 55-joint face+hands model (jaw/eye joints, expression blendshapes,
    # 51[+17] face landmarks when use_face).
    model_type: str = "smplh"
    # Gendered body-model selection (smpl_config.py:76-80; the live
    # fixture configs say male).  Host-side only: picks which asset
    # pipelines.gen_smplh.default_fit_model resolves, never traced.
    gender: str = "male"
    focal_length: float = 5000.0
    rho: float = 100.0
    optim_type: str = "lbfgsls"   # adam|lbfgs|lbfgsls|rmsprop|sgd
    lr: float = 1.0               # first-order optimizers only
    maxiters: int = 30
    ftol: float = 1e-9
    gtol: float = 1e-9
    use_vposer: bool = True
    use_hands: bool = True
    use_pca: bool = True          # PCA hand pose when the model carries
    num_pca_comps: int = 12       # hands_components (fit_smplh.yaml)
    # Which parameter groups the staged fit optimizes
    # (smpl_config.py:93-101): frozen groups keep their init values
    # (betas/hands from init_params, typically zeros = the mean shape /
    # rest hands) but still flow through the forward + priors.
    optim_shape: bool = True
    optim_hands: bool = True
    # Zero the hands' rest-pose mean (smpl_config.py:118-121): when False
    # (default) a model's hands_mean offsets the optimized hand pose, the
    # smplx convention.
    flat_hand_mean: bool = False
    try_both_orient: bool = False
    # Fit up to this many detected people per image (smpl_config.py:45-47;
    # the reference parses every person but fits only keypoints[[0]],
    # gen_smplh.py:158 — here persons fit in ONE batched program).
    max_persons: int = 3
    # When the 2D shoulder distance is under this many pixels the subject
    # is side-on and both orientations are tried regardless of
    # try_both_orient (reference fit_single_frame.py:287-290).  0 disables.
    side_view_thsh: float = 25.0
    # Body-pose prior when use_vposer is off: l2 | gmm (the reference's
    # 'mog' MaxMixture, prior.py:36-50,100-231; selected fitting.py:385-388).
    body_prior_type: str = "l2"
    num_gaussians: int = 8
    # Per-parameter-group step scales (key of the optimized param dict ->
    # float), a diagonal preconditioner on the minimizer (fit.optim
    # _with_scales).  Counters compensation valleys on redundant chains:
    # e.g. {"jaw": 8.0} lets the SMPL-X jaw articulate instead of being
    # absorbed by global pose/shape.  None = identity (reference behavior;
    # its torch LBFGS had no group scaling either).
    param_scales: Optional[Mapping[str, float]] = None
    prior_folder: str = ""        # dir holding gmm_{num_gaussians:02d}.pkl
    use_joints_conf: bool = True  # scale joint weights by detector conf
    joints_to_ign: Tuple[int, ...] = (1, 9, 12)
    init_joints_idxs: Tuple[int, ...] = (9, 12, 2, 5)
    body_tri_idxs: Tuple[Tuple[int, int], ...] = ((5, 12), (2, 9))
    depth_loss_weight: float = 1e2
    data_weights: Tuple[float, ...] = (1.0,) * 5
    body_pose_prior_weights: Tuple[float, ...] = (404.0, 404.0, 57.4,
                                                  4.78, 4.78)
    shape_weights: Tuple[float, ...] = (100.0, 50.0, 10.0, 5.0, 5.0)
    hand_pose_prior_weights: Tuple[float, ...] = (404.0, 404.0, 57.4,
                                                  4.78, 4.78)
    hand_joints_weights: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.1, 2.0)
    bending_prior_scale: float = 3.17   # fit_single_frame.py:382-383
    # SMPL-X face surface (smpl_config.py:90-98,137-141,186-202,232-238):
    # fit the 51 FLAME landmarks (+17 jawline contour) with per-stage
    # weights, optimize jaw pose / expression coefficients under L2-style
    # priors.  Eye poses are created but unconstrained by any keypoint, so
    # they stay at identity (the reference optimizes them to no effect).
    use_face: bool = False
    use_face_contour: bool = False
    optim_jaw: bool = True
    optim_expression: bool = True
    num_expression_coeffs: int = 10
    jaw_prior_type: str = "l2"
    expr_weights: Tuple[float, ...] = (100.0, 50.0, 10.0, 5.0, 5.0)
    face_joints_weights: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.1, 2.0)
    # Per-stage (pitch, yaw, roll) jaw-pose L2 scales; None derives the
    # reference's fallback [[w]*3 for w in body_pose_prior_weights].
    jaw_pose_prior_weights: Optional[Tuple[Tuple[float, float, float],
                                           ...]] = None
    # Self-collision term (fit_smplh.yaml:36,59-64 — off by default there
    # too).  "sphere" = fit.collision sphere proxy (cheap); "mesh" =
    # fit.mesh_collision dense cone-distance-field term, the TPU-native
    # equivalent of the reference's BVH + distance-field penalty
    # (fitting.py:404-442).  coll_cone_scale is the df_cone_height analog
    # (smpl_config.py:216-219), in triangle circumradii.
    interpenetration: bool = False
    coll_loss_weights: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.01, 1.0)
    coll_n_samples: int = 1024
    coll_mode: str = "sphere"
    coll_n_faces: int = 2048
    coll_cone_scale: float = 2.0
    # Video fitting (fit_sequence, chained): quadratic anchor pulling each
    # frame's pose / global orientation toward the previous frame's
    # solution — temporal smoothing the reference has no counterpart for
    # (it fits stills only).  0 disables; the anchor strength is a traced
    # operand so enabling it per-frame reuses one compiled program.
    temporal_weight: float = 0.0
    # TPU-first optimization (no reference counterpart): run the staged
    # fit on an exact reduced model — virtual joint rows (collapsed
    # J_regressor) + only the surface vertices the objective reads
    # (params.restrict_model) — instead of the full V-vertex LBS.  The
    # collision proxies' sampled vertex/face rows are included and
    # remapped, so interpenetration fits reduce too (sphere mode keeps
    # ~1k of 6890 rows; mesh mode most of them).  Identical
    # losses/solutions to within float roundoff; set False to force the
    # full-vertex forward.
    reduce_verts: bool = True
    # Warm-start iteration budgets for chained video fitting (no reference
    # counterpart — it fits stills with the full <=30x5x2 budget every
    # frame, fit_smplh.yaml:49).  Frames >= 1 of fit_sequence start from
    # the previous frame's solution, so they need a fraction of the
    # budget: warm_maxiters caps each stage's L-BFGS iterations and
    # warm_cam_maxiters the camera-stage iterations (0 = the previous
    # frame's camera/orientation pass through — only safe for a STATIC
    # camera: a frozen camera stage cannot track subject/camera motion,
    # which is why the default is a small nonzero budget).  Both are
    # TRACED operands of the one compiled fitter program — no recompile
    # vs the cold frame.  None disables (full budget every frame).
    warm_maxiters: Optional[int] = 10
    warm_cam_maxiters: int = 5


class FitOutput(NamedTuple):
    pose: np.ndarray            # (156,) global + body63 + hands90
    #                             ((72,) SMPL; (165,) SMPL-X with jaw+eyes)
    shape: np.ndarray           # (10,)
    camera_translation: np.ndarray  # (3,)
    camera_rotation: np.ndarray     # (3, 3)
    camera_center: np.ndarray       # (2,)
    camera_fx: float
    pose_embedding: np.ndarray  # (32,)
    loss: float
    expression: Optional[np.ndarray] = None   # (E,) SMPL-X only


def _project(joints3d, cam_t, focal, center):
    """PerspectiveCamera parity (lib/Gen_SMPLH/camera.py:104-117):
    x_cam = x + t (identity rotation), pinhole projection.

    Depth is clamped to 1cm: line-search trial points with the camera
    behind the body would otherwise overflow fp32 through the squared
    reprojection error and poison L-BFGS with NaNs."""
    cam = joints3d + cam_t
    z = jnp.maximum(cam[..., 2:3], 1e-2)
    return cam[..., :2] / z * focal + center


def _hand_aa(p, key, basis):
    """Hand axis-angle (45,) from either full aa or PCA coefficients
    (smplx use_pca parity: aa = mean + coeffs @ components; the mean also
    applies to the full-aa parameterization unless flat_hand_mean —
    smplx's hand_pose + hands_mean rest-pose convention)."""
    val = p.get(key, jnp.zeros(45))
    if basis is None:
        return val
    components, mean = basis
    if components is None:
        return mean + val
    return mean + val @ components


def _forward_joints(model, decoder, dec_params, p, use_vposer, focal,
                    center, vertex_ids, hand_bases=(None, None),
                    use_hands=True, lmk=None, use_face=False,
                    use_face_contour=False, n_expr=0):
    """SMPLH/SMPL/SMPL-X forward -> projected OpenPose joints.

    TPU-first: VPoser's decoded rotation MATRICES feed LBS directly
    (pose_is_rotmat) — the reference detours rotmat -> axis-angle ->
    rodrigues only because smplx wants axis-angle; skipping it removes both
    work and the non-differentiable-at-pi conversion from the grad path.

    ``model.num_joints`` selects the body family: 52 = SMPLH (21 body
    joints + 2x15 hands), 24 = SMPL (23 body joints, no articulated hands
    — VPoser's 21 decoded joints get identity wrists appended, the
    reference's torch.cat-zeros for model_type='smpl'), 55 = SMPL-X
    (21 body + jaw + 2 eyes + 2x15 hands).  For SMPL-X the caller passes
    a model whose shapedirs already has the expression blendshapes
    concatenated (``n_expr`` tail coefficients come from
    ``p["expression"]``), and ``lmk`` (landmark_gather) when fitting face
    keypoints.
    """
    from tpubody.core.rotations import rodrigues
    nj = model.num_joints
    n_body = 21 if nj in (52, 55) else nj - 1
    if use_vposer:
        body_R = decoder.apply(dec_params, p["pose_embedding"][None])[0]
        if body_R.shape[0] < n_body:   # SMPL: identity hand joints 22/23
            eye = jnp.broadcast_to(jnp.eye(3),
                                   (n_body - body_R.shape[0], 3, 3))
            body_R = jnp.concatenate([body_R, eye], axis=0)
    else:
        body_R = rodrigues(p["body_pose"].reshape(n_body, 3))
    parts = [rodrigues(p["global_orient"].reshape(1, 3)), body_R]
    if nj == 55:
        # Jaw + eyes under the head (SMPLX_PARENTS 22-24); eyes carry no
        # keypoint constraint and stay identity.
        parts.append(rodrigues(p.get("jaw", jnp.zeros(3)).reshape(1, 3)))
        parts.append(jnp.broadcast_to(jnp.eye(3), (2, 3, 3)))
    if nj in (52, 55):
        parts += [
            rodrigues(_hand_aa(p, "lhand", hand_bases[0]).reshape(15, 3)),
            rodrigues(_hand_aa(p, "rhand", hand_bases[1]).reshape(15, 3)),
        ]
    R = jnp.concatenate(parts, axis=0)             # (nj, 3, 3)
    beta = p["betas"]
    if n_expr:
        beta = jnp.concatenate(
            [beta, p.get("expression", jnp.zeros(n_expr))])
    state = smpl_lib.forward(model, R, beta, pose_is_rotmat=True)
    j_op = joints_lib.openpose_joints(state.verts, state.joints_posed,
                                      vertex_ids=vertex_ids,
                                      use_hands=use_hands,
                                      lmk=lmk, use_face=use_face,
                                      use_face_contour=use_face_contour)
    return _project(j_op, p["cam_t"], focal, center), body_R, state


def guess_init_depth(joints3d_op: jnp.ndarray, joints2d: jnp.ndarray,
                     body_tri_idxs, focal: float) -> jnp.ndarray:
    """Camera depth from mean limb-length ratio (fitting.py:36-110)."""
    d3, d2 = [], []
    for a, b in body_tri_idxs:
        d3.append(jnp.linalg.norm(joints3d_op[a] - joints3d_op[b]))
        d2.append(jnp.linalg.norm(joints2d[a] - joints2d[b]))
    h3 = jnp.mean(jnp.asarray(d3))
    h2 = jnp.maximum(jnp.mean(jnp.asarray(d2)), 1e-6)
    return focal * h3 / h2


# --- shared per-config setup (fit_frame + fit_frames) -------------------

def _setup_hand_bases(model, config: FitConfig):
    """PCA hand bases when configured and available: ((comps, mean) x2,
    hand_dim).  SMPL (24 joints) has no articulated hands: dim 0.

    flat_hand_mean (smpl_config.py:118-121, default False) zeroes the
    rest-pose mean; otherwise the model's hands_mean offsets BOTH the PCA
    and the full-aa parameterizations (the smplx convention)."""
    hand_bases = (None, None)
    if model.num_joints not in (52, 55):
        return hand_bases, 0
    hand_dim = 45
    flat = getattr(config, "flat_hand_mean", False)
    ml = model.hands_mean_l if (model.hands_mean_l is not None
                                and not flat) else jnp.zeros(45)
    mr = model.hands_mean_r if (model.hands_mean_r is not None
                                and not flat) else jnp.zeros(45)
    if (config.use_pca and model.hands_components_l is not None
            and model.hands_components_r is not None):
        n = config.num_pca_comps
        hand_bases = ((model.hands_components_l[:n], ml),
                      (model.hands_components_r[:n], mr))
        hand_dim = n
    elif (model.hands_mean_l is not None
          or model.hands_mean_r is not None):
        # Full-aa parameterization on a model that carries rest-pose
        # means: aa = mean + val (identity components).
        hand_bases = ((None, ml), (None, mr))
    return hand_bases, hand_dim


class _FamilySetup(NamedTuple):
    """Model-family-dependent fit setup shared by fit_frame/BatchFitter."""
    fit_model: object          # model, with expression dirs folded into
    #                            shapedirs for SMPL-X (betas+expr coeffs)
    use_hands: bool
    use_face: bool
    use_face_contour: bool
    body_dim: int              # 63 for SMPLH/SMPL-X, 69 for SMPL
    n_expr: int                # optimized expression coefficients (0 = off)
    lmk: object                # (vert_ids, bary) landmark gather or None
    jw: jnp.ndarray            # per-keypoint-row base weights
    vertex_ids: np.ndarray
    coll_fn: object            # verts -> penalty, indices matching
    #                            fit_model's (possibly reduced) verts; None
    #                            when interpenetration is off


def _setup_family(model, config: FitConfig) -> _FamilySetup:
    nj = model.num_joints
    if nj not in (24, 52, 55):
        raise ValueError(f"unsupported body family: {nj} joints "
                         "(24=SMPL, 52=SMPLH, 55=SMPL-X)")
    use_hands = config.use_hands and nj in (52, 55)
    body_dim = 63 if nj in (52, 55) else 3 * (nj - 1)
    use_face = config.use_face and nj == 55
    use_face_contour = use_face and config.use_face_contour
    n_expr = 0
    fit_model = model
    lmk = None
    if nj == 55:
        if config.optim_expression and model.expr_dirs is not None:
            n_expr = min(config.num_expression_coeffs,
                         model.num_expressions)
            fit_model = dataclasses.replace(
                model, shapedirs=jnp.concatenate(
                    [model.shapedirs, model.expr_dirs[:, :, :n_expr]],
                    axis=-1))
        if use_face:
            lmk = joints_lib.landmark_gather(model)
            if lmk is None:
                raise ValueError(
                    "use_face needs a model with a face-landmark embedding "
                    "(lmk_faces_idx/lmk_bary_coords)")
    jw = jnp.asarray(kp_lib.joint_weights(
        config.joints_to_ign, use_hands, use_face, use_face_contour),
        jnp.float32)
    vertex_ids = joints_lib.extra_vertex_ids(model.num_verts, n_joints=nj)
    coll = _setup_collision(model, config)   # (loss_fn, full-model proxy)
    if config.reduce_verts:
        # The objective only reads joints + these vertex rows (extra
        # joints, face landmarks, collision-proxy samples): swap in the
        # exact reduced model (see FitConfig.reduce_verts) and remap every
        # gather into it.
        pieces = [np.asarray(vertex_ids, np.int64).reshape(-1)]
        if lmk is not None:
            pieces.append(np.asarray(lmk[0], np.int64).reshape(-1))
        if coll is not None:
            proxy = coll[1]
            if hasattr(proxy, "face_vids"):
                pieces.append(np.asarray(proxy.face_vids,
                                         np.int64).reshape(-1))
            pieces.append(np.asarray(proxy.vertex_idx,
                                     np.int64).reshape(-1))
        sizes = np.cumsum([p.size for p in pieces])
        fit_model, rows = params_lib.restrict_model(
            fit_model, np.concatenate(pieces))
        parts = np.split(rows, sizes[:-1])
        vertex_ids = parts[0]
        k = 1
        if lmk is not None:
            lmk = (parts[k].reshape(np.asarray(lmk[0]).shape), lmk[1])
            k += 1
        if coll is not None:
            loss_fn, proxy = coll
            if hasattr(proxy, "face_vids"):
                proxy = proxy._replace(
                    face_vids=parts[k].reshape(-1, 3).astype(np.int32),
                    vertex_idx=parts[k + 1].astype(np.int32))
            else:
                proxy = proxy._replace(
                    vertex_idx=parts[k].astype(np.int32))
            coll = (loss_fn, proxy)
    coll_fn = (functools.partial(coll[0], proxy=coll[1])
               if coll is not None else None)
    return _FamilySetup(fit_model, use_hands, use_face, use_face_contour,
                        body_dim, n_expr, lmk, jw, vertex_ids, coll_fn)


def _setup_gmm(config: FitConfig, body_dim: int = 63):
    """GMM body-pose prior for the non-VPoser path (reference
    fitting.py:385-388 routes through the prior from body_prior_type).
    ``body_dim`` is 63 for SMPLH (21 body joints), 69 for SMPL (23)."""
    if config.use_vposer or config.body_prior_type not in ("gmm", "mog"):
        return None
    import os as _os

    gmm_path = _os.path.join(
        config.prior_folder, f"gmm_{config.num_gaussians:02d}.pkl") \
        if config.prior_folder else ""
    if gmm_path and _os.path.exists(gmm_path):
        gmm_prior = priors_lib.load_gmm(gmm_path)
        if gmm_prior.means.shape[1] < body_dim:
            raise ValueError(
                f"GMM prior is {gmm_prior.means.shape[1]}-dim; the model's "
                f"body pose needs {body_dim}")
        if gmm_prior.means.shape[1] != body_dim:
            # SMPLify GMM pickles are 69-dim (23 SMPL body joints);
            # SMPLH body pose is 63-dim — keep the shared prefix.
            gmm_prior = priors_lib.GMMPrior(
                means=gmm_prior.means[:, :body_dim],
                precisions=gmm_prior.precisions[:, :body_dim, :body_dim],
                log_norm=gmm_prior.log_norm)
        return gmm_prior
    return priors_lib.synthetic_gmm(
        n_components=config.num_gaussians, dim=body_dim)


def _setup_collision(model, config: FitConfig):
    """Optional self-collision penalty (fitting.py:404-442 equivalents).

    Returns ``(loss_fn, proxy)`` or None.  The proxy indexes the FULL
    model's vertices; _setup_family remaps it when the fit runs on a
    reduced model."""
    if not config.interpenetration:
        return None
    if config.coll_mode == "mesh":
        from tpubody.fit import mesh_collision as mcoll_lib
        mesh_proxy = mcoll_lib.build_mesh_collision(
            np.asarray(model.v_template), np.asarray(model.faces),
            np.asarray(model.weights), np.asarray(model.parents),
            n_faces=config.coll_n_faces, n_verts=config.coll_n_samples,
            cone_scale=config.coll_cone_scale)
        return mcoll_lib.mesh_penetration_loss, mesh_proxy
    from tpubody.fit import collision as coll_lib
    coll_proxy = coll_lib.build_collision_proxy(
        np.asarray(model.v_template), np.asarray(model.weights),
        np.asarray(model.parents), n_samples=config.coll_n_samples)
    return coll_lib.penetration_loss, coll_proxy


def _make_body_loss(fam: _FamilySetup, decoder, dec_params,
                    config: FitConfig, focal, hand_bases, gmm_prior,
                    coll_fn):
    """The staged-fit objective (reference SMPLifyLoss, fitting.py:365-449),
    shared verbatim by fit_frame and BatchFitter so the single-frame and
    batched paths cannot drift apart.

    Returns ``loss(p, w, gt2d, conf, center, anchor=None)`` where ``anchor``
    is an optional ``(anchor_w, pose_init, orient_init, pose_key)`` temporal
    term (chained video fitting; anchor_w == 0 disables per frame)."""
    model = fam.fit_model
    use_hands = fam.use_hands
    jw = fam.jw
    n_hand_rows = 2 * 21 if use_hands else 0
    face_start = 25 + n_hand_rows

    def body_loss(p, w, gt2d, conf, center, anchor=None):
        proj, body_R, state = _forward_joints(
            model, decoder, dec_params, p, config.use_vposer, focal,
            center, fam.vertex_ids, hand_bases, use_hands=use_hands,
            lmk=fam.lmk, use_face=fam.use_face,
            use_face_contour=fam.use_face_contour, n_expr=fam.n_expr)
        # Smooth axis-angle proxy from the rotation skew part
        # (sin(theta)*axis): sign- and monotonicity-preserving on the bend
        # range, and differentiable everywhere (unlike exact mat2aa).
        body63 = jnp.stack([
            (body_R[:, 2, 1] - body_R[:, 1, 2]) / 2,
            (body_R[:, 0, 2] - body_R[:, 2, 0]) / 2,
            (body_R[:, 1, 0] - body_R[:, 0, 1]) / 2,
        ], axis=-1).reshape(-1)
        weights = jw * conf if config.use_joints_conf else jw
        weights = weights.at[25:face_start].multiply(w["hand_joints"])
        if fam.use_face:      # per-stage face-landmark weight (SMPL-X)
            weights = weights.at[face_start:].multiply(w["face_joints"])
        diff = priors_lib.gmof(gt2d - proj, config.rho)
        joint_loss = jnp.sum(weights[:, None] ** 2 * diff) * w["data"] ** 2
        if config.use_vposer:
            pprior = jnp.sum(p["pose_embedding"] ** 2) * w["body_pose"] ** 2
        elif gmm_prior is not None:
            pprior = priors_lib.max_mixture_prior(
                p["body_pose"], gmm_prior) * w["body_pose"] ** 2
        else:
            pprior = priors_lib.l2_prior(p["body_pose"]) * w["body_pose"] ** 2
        shape_loss = priors_lib.l2_prior(p["betas"]) * w["shape"] ** 2
        # Elbow/knee indices (52,55,9,12 after dropping global orient) all
        # fall inside the 63-dim body pose (reference fitting.py:399-402).
        bend = jnp.sum(priors_lib.angle_prior(body63)) * w["bending"]
        hands = ((priors_lib.l2_prior(p["lhand"])
                  + priors_lib.l2_prior(p["rhand"])) * w["hand_prior"] ** 2
                 if "lhand" in p else 0.0)
        # SMPL-X face terms (reference fitting.py:412-423): L2 expression
        # prior scaled by expr_weight^2; jaw L2 with a per-axis
        # (pitch, yaw, roll) scale INSIDE the square.
        face = 0.0
        if "expression" in p:
            face = face + priors_lib.l2_prior(p["expression"]) \
                * w["expr"] ** 2
        if "jaw" in p:
            face = face + jnp.sum((p["jaw"] * w["jaw"]) ** 2)
        total = joint_loss + pprior + shape_loss + bend + hands + face
        if coll_fn is not None:
            total = total + w["coll"] * coll_fn(state.verts)
        if anchor is not None:
            # Anchor to the previous frame's solution (= this frame's warm
            # start in fit_sequence's chained mode); anchor_w is 0 on
            # unanchored frames.
            anchor_w, pose_init, orient_init, pose_key = anchor
            total = total + anchor_w * (
                jnp.sum((p[pose_key] - pose_init) ** 2)
                + jnp.sum((p["global_orient"] - orient_init) ** 2))
        return total

    return body_loss


def _stage_weights(config: FitConfig):
    """Per-stage weight schedule stacked on a leading stage axis (scan
    input).  body_pose_prior_weights defines the stage count; other
    schedules may be LONGER (e.g. untouched 5-stage defaults with a
    shorter explicit schedule) and are truncated, but a schedule SHORTER
    than the stage count raises.  Explicit-length consistency for YAML /
    caller-provided schedules is enforced in pipelines.gen_smplh
    .load_config (the reference's fit_single_frame.py:110-147 asserts)."""
    n_stages = len(config.body_pose_prior_weights)
    # Jaw fallback: the reference derives [[w]*3 per stage] from the body
    # pose prior weights when no explicit schedule is given.
    jaw = config.jaw_pose_prior_weights
    if jaw is None:
        jaw = tuple((w,) * 3 for w in config.body_pose_prior_weights)
    else:
        jaw = tuple(tuple(float(x) for x in row) for row in jaw)
        if any(len(row) != 3 for row in jaw):
            raise ValueError("jaw_pose_prior_weights rows must be "
                             "(pitch, yaw, roll) triples")
    ws = {
        "data": config.data_weights[:n_stages],
        "body_pose": config.body_pose_prior_weights,
        "shape": config.shape_weights[:n_stages],
        "bending": [config.bending_prior_scale * b
                    for b in config.body_pose_prior_weights],
        "hand_prior": config.hand_pose_prior_weights[:n_stages],
        "hand_joints": (config.hand_joints_weights[:n_stages]
                        if config.use_hands else [0.0] * n_stages),
        "coll": (config.coll_loss_weights[:n_stages]
                 if config.interpenetration else [0.0] * n_stages),
        # SMPL-X-only terms: inert zeros for the other families so a
        # short (4-stage reference-default) expr/face schedule beside a
        # 5-stage body schedule cannot trip the length check when unused.
        "expr": (config.expr_weights[:n_stages]
                 if config.model_type == "smplx" else [0.0] * n_stages),
        "face_joints": (config.face_joints_weights[:n_stages]
                        if config.model_type == "smplx" and config.use_face
                        else [0.0] * n_stages),
        "jaw": (jaw[:n_stages] if config.model_type == "smplx"
                else [(0.0,) * 3] * n_stages),
    }
    for k, v in ws.items():
        if len(v) != n_stages:
            raise ValueError(
                f"config weight schedule '{k}' has {len(v)} entries; "
                f"expected {n_stages} (one per stage, reference "
                "fit_single_frame.py:110-147 consistency asserts)")
    return {k: jnp.asarray(v, jnp.float32) for k, v in ws.items()}


def fit_frame(
    model: params_lib.BodyModelParams,      # 52-joint SMPLH or 24-joint SMPL
    keypoints: np.ndarray,                  # (67, 3) x, y, conf (25 for SMPL)
    camera_center: np.ndarray,              # (2,)
    config: FitConfig = FitConfig(),
    dec_params=None,
    rng: Optional[jax.Array] = None,
    init_cam_t: Optional[np.ndarray] = None,
    init_params: Optional[dict] = None,
) -> FitOutput:
    """Fit SMPLH (or 24-joint SMPL) parameters to one frame's keypoints.

    ``init_cam_t`` overrides the limb-ratio depth heuristic
    (guess_init, reference fitting.py:36-110) with an external camera
    estimate — e.g. the HMR regressor's camera when SMPLify runs as a
    refinement stage.  ``init_params`` optionally seeds any of
    ``global_orient`` (3,), ``betas`` (10,), ``pose_embedding`` (32,) /
    ``body_pose`` (63, — 69 for SMPL), ``lhand``/``rhand`` — the SPIN-style
    regress-then-optimize warm start (pipelines/refine.py)."""
    decoder = vposer_lib.VPoserDecoder()
    if dec_params is None:
        _, dec_params = vposer_lib.create_decoder(rng)
    init_params = {k: jnp.asarray(np.asarray(v), jnp.float32)
                   for k, v in (init_params or {}).items()}

    nj = model.num_joints                    # 52 SMPLH / 24 SMPL / 55 SMPL-X
    fam = _setup_family(model, config)
    use_hands = fam.use_hands
    body_dim = fam.body_dim
    kps = jnp.asarray(keypoints, jnp.float32)
    gt2d = kps[:, :2]
    conf = kps[:, 2]
    center = jnp.asarray(np.asarray(camera_center), jnp.float32)
    focal = config.focal_length
    vertex_ids = fam.vertex_ids

    # PCA hand bases (use_pca + model carries components): optimize
    # num_pca_comps coefficients per hand instead of 45 axis-angles.
    hand_bases, hand_dim = _setup_hand_bases(model, config)

    # --- initialization -------------------------------------------------
    zeros_p = {
        "global_orient": jnp.zeros(3), "betas": jnp.zeros(10),
        "pose_embedding": jnp.zeros(32), "body_pose": jnp.zeros(body_dim),
        "cam_t": jnp.zeros(3),
    }
    if nj in (52, 55):
        zeros_p["lhand"] = jnp.zeros(hand_dim)
        zeros_p["rhand"] = jnp.zeros(hand_dim)

    gmm_prior = _setup_gmm(config, body_dim)
    state0 = smpl_lib.forward(fam.fit_model, jnp.zeros((nj, 3)),
                              jnp.zeros(10 + fam.n_expr))
    j0 = joints_lib.openpose_joints(state0.verts, state0.joints_posed,
                                    use_hands=use_hands,
                                    vertex_ids=vertex_ids)
    if init_cam_t is not None:
        init_t = jnp.asarray(np.asarray(init_cam_t), jnp.float32)
        est_d = init_t[2]
    else:
        est_d = guess_init_depth(j0, gt2d, config.body_tri_idxs, focal)
        init_t = jnp.asarray([0.0, 0.0, est_d])

    # --- camera stage ---------------------------------------------------
    init_idxs = jnp.asarray(config.init_joints_idxs)

    def camera_loss(p):
        proj, _, _ = _forward_joints(
            fam.fit_model, decoder, dec_params,
            {**zeros_p, "cam_t": p["cam_t"],
             "global_orient": p["global_orient"]},
            config.use_vposer, focal, center, vertex_ids, hand_bases,
            use_hands=use_hands, n_expr=fam.n_expr)
        err = jnp.sum((gt2d[init_idxs] - proj[init_idxs]) ** 2)
        depth = config.depth_loss_weight ** 2 * (p["cam_t"][2] - est_d) ** 2
        return err + depth

    # Optimizer per config (optim_type flows in from conf.yaml like the
    # reference's smpl_config.py:247 / optim_factory.py:27-65).
    from tpubody.fit import optim as optim_lib
    opt = optim_lib.create_optimizer(
        config.optim_type, lr=config.lr, maxiters=config.maxiters,
        ftol=config.ftol, gtol=config.gtol,
        param_scales=config.param_scales)

    cam_res = jax.jit(lambda x0: opt.minimize(camera_loss, x0))(
        {"cam_t": init_t,
         "global_orient": init_params.get("global_orient",
                                          zeros_p["global_orient"])})
    cam_t0 = cam_res.params["cam_t"]
    orient0 = cam_res.params["global_orient"]

    # --- orientation candidates ----------------------------------------
    # Side-on subjects (2D shoulders nearly coincident) are ambiguous up to
    # a 180-degree flip — try both (fit_single_frame.py:287-290,337-356).
    shoulder_dist = float(np.linalg.norm(
        np.asarray(gt2d[2]) - np.asarray(gt2d[5])))
    try_both = (config.try_both_orient
                or shoulder_dist < config.side_view_thsh)
    orients = [np.asarray(orient0)]
    if try_both:
        from tpubody.core.rotations import rodrigues, rotmat_to_axis_angle
        R0 = np.asarray(rodrigues(orient0))
        Rflip = np.asarray(rodrigues(jnp.asarray([0.0, np.pi, 0.0])))
        orients.append(np.asarray(
            rotmat_to_axis_angle(jnp.asarray(R0 @ Rflip))))

    coll_fn = fam.coll_fn

    shared_loss = _make_body_loss(fam, decoder, dec_params, config, focal,
                                  hand_bases, gmm_prior, coll_fn)

    # Frozen groups (optim_shape/optim_hands false, smpl_config.py:93-101):
    # excluded from the optimized dict, merged back for the forward/priors
    # and the final artifacts.
    frozen = {}
    if not config.optim_shape:
        frozen["betas"] = init_params.get("betas", jnp.zeros(10))
    if nj in (52, 55) and not config.optim_hands:
        frozen["lhand"] = init_params.get("lhand", jnp.zeros(hand_dim))
        frozen["rhand"] = init_params.get("rhand", jnp.zeros(hand_dim))

    def body_loss(p, w):
        return shared_loss({**p, **frozen}, w, gt2d, conf, center)

    # Per-stage weights, stacked on a leading stage axis and fed through a
    # lax.scan so the entire 5-stage schedule (and both orientation
    # candidates) runs through ONE compiled minimizer program.  The previous
    # per-stage functools.partial(body_loss, w=w) re-traced — and therefore
    # recompiled — the L-BFGS while_loop for every stage and orientation
    # (up to 10 structurally identical XLA compiles per fit).
    ws = _stage_weights(config)

    @jax.jit
    def run_stages(p0):
        def step(p, w):
            res = opt.minimize(functools.partial(body_loss, w=w), p)
            return res.params, res.loss

        return jax.lax.scan(step, p0, ws)

    best = None
    for orient in orients:
        p = {
            "global_orient": jnp.asarray(orient, jnp.float32).reshape(3),
            "betas": init_params.get("betas", jnp.zeros(10)),
            "cam_t": cam_t0,
        }
        if nj in (52, 55):
            p["lhand"] = init_params.get("lhand", jnp.zeros(hand_dim))
            p["rhand"] = init_params.get("rhand", jnp.zeros(hand_dim))
        if nj == 55:
            if config.optim_jaw:
                p["jaw"] = init_params.get("jaw", jnp.zeros(3))
            if fam.n_expr:
                p["expression"] = init_params.get(
                    "expression", jnp.zeros(fam.n_expr))
        # Only the live pose parameterization is optimized: the latent
        # embedding under VPoser, raw 63-dim axis-angle otherwise.
        if config.use_vposer:
            p["pose_embedding"] = init_params.get("pose_embedding",
                                                  jnp.zeros(32))
        else:
            p["body_pose"] = init_params.get("body_pose",
                                             jnp.zeros(body_dim))
        for k in frozen:
            p.pop(k, None)
        p, stage_losses = run_stages(p)
        loss_val = float(stage_losses[-1])
        if best is None or loss_val < best[0]:
            best = (loss_val, p)

    loss_val, p = best
    p = {**p, **frozen}
    if config.use_vposer:
        body = np.asarray(vposer_lib.decode_to_axis_angle(
            decoder, dec_params, p["pose_embedding"][None])[0])
        if body.size < body_dim:     # SMPL: zero hand joints 22/23
            body = np.concatenate([body.reshape(-1),
                                   np.zeros(body_dim - body.size)])
    else:
        body = np.asarray(p["body_pose"])
    return _finalize_fit(p, body, hand_bases, camera_center, focal,
                         loss_val, nj=nj)


def _finalize_fit(p, body, hand_bases, camera_center, focal, loss_val,
                  nj=52) -> "FitOutput":
    """Pose vector assembly: (156,) = global+body63+hands for SMPLH,
    (72,) = global+body69 for SMPL (hand_dim 0), (165,) =
    global+body63+jaw+leye+reye+hands for SMPL-X."""
    parts = [np.asarray(p["global_orient"]).reshape(3),
             np.asarray(body).reshape(-1)]
    if nj == 55:
        parts.append(np.asarray(p.get("jaw", jnp.zeros(3))).reshape(3))
        parts.append(np.zeros(6))    # leye/reye stay identity
    if "lhand" in p:
        parts.append(np.asarray(
            _hand_aa(p, "lhand", hand_bases[0])).reshape(45))
        parts.append(np.asarray(
            _hand_aa(p, "rhand", hand_bases[1])).reshape(45))
    pose = np.concatenate(parts)
    return FitOutput(
        pose=pose,
        shape=np.asarray(p["betas"]),
        camera_translation=np.asarray(p["cam_t"]),
        camera_rotation=np.eye(3),
        camera_center=np.asarray(camera_center),
        camera_fx=focal,
        pose_embedding=np.asarray(p.get("pose_embedding", jnp.zeros(32))),
        loss=loss_val,
        expression=(np.asarray(p["expression"])
                    if "expression" in p else None),
    )


class FitBatchOutput(NamedTuple):
    pose: np.ndarray                # (N, 156) — (N, 72)/(N, 165) smpl/smplx
    shape: np.ndarray               # (N, 10)
    camera_translation: np.ndarray  # (N, 3)
    camera_center: np.ndarray       # (N, 2)
    camera_fx: float
    pose_embedding: np.ndarray      # (N, 32)
    loss: np.ndarray                # (N,)
    expression: Optional[np.ndarray] = None   # (N, E) SMPL-X only


class BatchFitter:
    """Reusable compiled batched SMPLify (the engine behind fit_frames).

    Construct once per (model, config); every ``__call__`` with the same
    batch size then reuses the already-compiled program — the cold compile
    is minutes on a TPU host, so per-call closure rebuilds would recompile
    every time.  ``fit_frames`` keeps a small identity-keyed cache of
    these for the convenience-function path.

    ``bucket=True`` (default) pads each call's batch up to the next power
    of two (with copies of lane 0; outputs are sliced back), so variable
    batch sizes — e.g. multi-person images flattened into the frame axis —
    share compiled programs instead of paying the minutes-long XLA compile
    once per distinct N.  Lanes run in vmap-lockstep anyway, so padding
    changes no lane's result; set ``bucket=False`` to compile exact sizes.
    """

    def __init__(self,
                 model: params_lib.BodyModelParams,
                 config: FitConfig = FitConfig(),
                 dec_params=None,
                 rng: Optional[jax.Array] = None,
                 bucket: bool = True):
        self.bucket = bucket
        decoder = vposer_lib.VPoserDecoder()
        if dec_params is None:
            _, dec_params = vposer_lib.create_decoder(rng)
        self.model = model
        self.config = config
        self.dec_params = dec_params

        nj = model.num_joints              # 52 SMPLH / 24 SMPL / 55 SMPL-X
        fam = _setup_family(model, config)
        use_hands = fam.use_hands
        body_dim = fam.body_dim
        vertex_ids = fam.vertex_ids
        hand_bases, hand_dim = _setup_hand_bases(model, config)
        gmm_prior = _setup_gmm(config, body_dim)
        coll_fn = fam.coll_fn
        ws = _stage_weights(config)
        focal = config.focal_length
        init_idxs = jnp.asarray(config.init_joints_idxs)
        self.hand_bases = hand_bases
        self.body_dim = body_dim
        self.n_expr = fam.n_expr
        self.pose_dim = 32 if config.use_vposer else body_dim
        self.pose_key = "pose_embedding" if config.use_vposer \
            else "body_pose"
        pose_key = self.pose_key

        from tpubody.core.rotations import rodrigues, rotmat_to_axis_angle
        from tpubody.fit import optim as optim_lib
        opt = optim_lib.create_optimizer(
            config.optim_type, lr=config.lr, maxiters=config.maxiters,
            ftol=config.ftol, gtol=config.gtol,
            param_scales=config.param_scales)

        zeros_p = {
            "global_orient": jnp.zeros(3), "betas": jnp.zeros(10),
            "pose_embedding": jnp.zeros(32),
            "body_pose": jnp.zeros(body_dim),
            "cam_t": jnp.zeros(3),
        }
        if nj in (52, 55):
            zeros_p["lhand"] = jnp.zeros(hand_dim)
            zeros_p["rhand"] = jnp.zeros(hand_dim)

        shared_loss = _make_body_loss(fam, decoder, dec_params, config,
                                      focal, hand_bases, gmm_prior, coll_fn)

        def fit_one(kps, center, init_t, has_init_t, betas_init, pose_init,
                    orient_init, anchor_w, cam_iters, stage_iters):
            gt2d = kps[:, :2]
            conf = kps[:, 2]

            # Frame-independent zero-pose joints: unbatched under vmap.
            state0 = smpl_lib.forward(fam.fit_model, jnp.zeros((nj, 3)),
                                      jnp.zeros(10 + fam.n_expr))
            j0 = joints_lib.openpose_joints(state0.verts, state0.joints_posed,
                                            use_hands=use_hands,
                                            vertex_ids=vertex_ids)
            est_d = jnp.where(
                has_init_t, init_t[2],
                guess_init_depth(j0, gt2d, config.body_tri_idxs, focal))
            cam0 = jnp.where(has_init_t, init_t,
                             jnp.asarray([0.0, 0.0, 1.0]) * est_d)

            def camera_loss(p):
                proj, _, _ = _forward_joints(
                    fam.fit_model, decoder, dec_params,
                    {**zeros_p, "cam_t": p["cam_t"],
                     "global_orient": p["global_orient"]},
                    config.use_vposer, focal, center, vertex_ids, hand_bases,
                    use_hands=use_hands, n_expr=fam.n_expr)
                err = jnp.sum((gt2d[init_idxs] - proj[init_idxs]) ** 2)
                depth = config.depth_loss_weight ** 2 * \
                    (p["cam_t"][2] - est_d) ** 2
                return err + depth

            cam_res = opt.minimize(
                camera_loss,
                {"cam_t": cam0, "global_orient": orient_init},
                maxiters_op=cam_iters)
            cam_t0 = cam_res.params["cam_t"]
            orient0 = cam_res.params["global_orient"]

            R0 = rodrigues(orient0)
            Rflip = rodrigues(jnp.asarray([0.0, jnp.pi, 0.0]))
            orient1 = rotmat_to_axis_angle(R0 @ Rflip)
            shoulder = jnp.linalg.norm(gt2d[2] - gt2d[5])
            allow_flip = jnp.asarray(config.try_both_orient) | \
                (shoulder < config.side_view_thsh)

            anchor = ((anchor_w, pose_init, orient_init, pose_key)
                      if config.temporal_weight > 0.0 else None)

            # Frozen groups (optim_shape/optim_hands false): see fit_frame.
            frozen = {}
            if not config.optim_shape:
                frozen["betas"] = betas_init
            if nj in (52, 55) and not config.optim_hands:
                frozen["lhand"] = jnp.zeros(hand_dim)
                frozen["rhand"] = jnp.zeros(hand_dim)

            def body_loss(p, w):
                return shared_loss({**p, **frozen}, w, gt2d, conf, center,
                                   anchor)

            def run(orient):
                p0 = {
                    "global_orient": orient.reshape(3),
                    "betas": betas_init,
                    "cam_t": cam_t0,
                }
                if nj in (52, 55):
                    p0["lhand"] = jnp.zeros(hand_dim)
                    p0["rhand"] = jnp.zeros(hand_dim)
                if nj == 55:
                    if config.optim_jaw:
                        p0["jaw"] = jnp.zeros(3)
                    if fam.n_expr:
                        p0["expression"] = jnp.zeros(fam.n_expr)
                p0[pose_key] = pose_init
                for k in frozen:
                    p0.pop(k, None)

                def step(p, wsi):
                    w, si = wsi
                    res = opt.minimize(functools.partial(body_loss, w=w), p,
                                       maxiters_op=si)
                    return res.params, res.loss

                p, stage_losses = jax.lax.scan(step, p0, (ws, stage_iters))
                return p, stage_losses[-1]

            p_a, l_a = run(orient0)
            p_b, l_b = run(orient1)
            use_b = allow_flip & (l_b < l_a)
            p = jax.tree_util.tree_map(
                lambda a, b: jnp.where(use_b, b, a), p_a, p_b)
            p = {**p, **frozen}
            loss = jnp.where(use_b, l_b, l_a)

            if config.use_vposer:
                body = jnp.reshape(vposer_lib.decode_to_axis_angle(
                    decoder, dec_params, p["pose_embedding"][None])[0], (-1,))
                if body.shape[0] < body_dim:   # SMPL: zero joints 22/23
                    body = jnp.concatenate(
                        [body, jnp.zeros(body_dim - body.shape[0])])
            else:
                body = jnp.reshape(p["body_pose"], (body_dim,))
            parts = [p["global_orient"].reshape(3), body]
            if nj == 55:
                parts += [p.get("jaw", jnp.zeros(3)).reshape(3),
                          jnp.zeros(6)]     # leye/reye stay identity
            if nj in (52, 55):
                parts += [
                    jnp.reshape(_hand_aa(p, "lhand", hand_bases[0]), (45,)),
                    jnp.reshape(_hand_aa(p, "rhand", hand_bases[1]), (45,)),
                ]
            # (156,) SMPLH / (72,) SMPL / (165,) SMPL-X
            pose = jnp.concatenate(parts)
            return {
                "pose": pose, "shape": p["betas"], "cam_t": p["cam_t"],
                "emb": p.get("pose_embedding", jnp.zeros(32)), "loss": loss,
                "expression": p.get("expression",
                                    jnp.zeros(max(fam.n_expr, 1))),
            }

        self.n_stages = len(config.body_pose_prior_weights)
        # Iteration budgets ride as UNBATCHED traced operands (in_axes
        # None): warm-started calls shrink the while_loop bounds through
        # the same compiled program.
        self._fitter = jax.jit(jax.vmap(
            fit_one, in_axes=(0,) * 8 + (None, None)))

    def _budgets(self, cam_maxiters=None, stage_maxiters=None):
        cam = jnp.asarray(self.config.maxiters if cam_maxiters is None
                          else cam_maxiters, jnp.int32)
        if stage_maxiters is None:
            stages = jnp.full((self.n_stages,), self.config.maxiters,
                              jnp.int32)
        else:
            stages = jnp.broadcast_to(
                jnp.asarray(stage_maxiters, jnp.int32), (self.n_stages,))
        return cam, stages

    def apply(self, kps, centers, init_t=None, has_init=None,
              betas0=None, pose0=None, orient0=None, anchor_w=None,
              cam_maxiters=None, stage_maxiters=None):
        """Raw traced entry: batched device arrays in -> dict of arrays
        out ({"pose","shape","cam_t","emb","loss"}, leading batch dim).
        Usable INSIDE another jitted program (e.g. a serving step);
        ``__call__`` is the host-convenience wrapper."""
        B = kps.shape[0]
        cam_it, stage_it = self._budgets(cam_maxiters, stage_maxiters)
        return self._fitter(
            kps, centers,
            jnp.zeros((B, 3)) if init_t is None else init_t,
            jnp.zeros((B,), bool) if has_init is None else has_init,
            jnp.zeros((B, 10)) if betas0 is None else betas0,
            jnp.zeros((B, self.pose_dim)) if pose0 is None else pose0,
            jnp.zeros((B, 3)) if orient0 is None else orient0,
            jnp.zeros((B,)) if anchor_w is None else anchor_w,
            cam_it, stage_it)

    def __call__(self,
                 keypoints: np.ndarray,          # (N, 67, 3)
                 camera_centers: np.ndarray,     # (N, 2) or (2,)
                 init_cam_t: Optional[np.ndarray] = None,   # (N, 3)
                 init_params: Optional[dict] = None,        # N-leading
                 anchor_weight: Optional[np.ndarray] = None,  # (N,)
                 cam_maxiters: Optional[int] = None,
                 stage_maxiters=None,            # scalar or (n_stages,)
                 mesh=None) -> FitBatchOutput:
        kps_all = jnp.asarray(np.asarray(keypoints, np.float32))
        N = kps_all.shape[0]
        centers_np = np.broadcast_to(
            np.asarray(camera_centers, np.float32), (N, 2)).copy()
        centers = jnp.asarray(centers_np)
        if init_cam_t is None:
            init_t_all = jnp.zeros((N, 3), jnp.float32)
            has_init = jnp.zeros((N,), bool)
        else:
            init_t_all = jnp.asarray(
                np.asarray(init_cam_t, np.float32)).reshape(N, 3)
            has_init = jnp.ones((N,), bool)

        # Per-frame warm starts (SPIN-style regress-then-optimize): any
        # entry absent from init_params falls back to zeros.
        ip = {k: jnp.asarray(np.asarray(v), jnp.float32)
              for k, v in (init_params or {}).items()}
        betas0_all = ip.get("betas", jnp.zeros((N, 10)))
        pose0_all = ip.get(self.pose_key, jnp.zeros((N, self.pose_dim)))
        orient0_all = ip.get("global_orient", jnp.zeros((N, 3)))

        anchor_all = (jnp.zeros((N,), jnp.float32) if anchor_weight is None
                      else jnp.asarray(
                          np.asarray(anchor_weight, np.float32)).reshape(N))
        inputs = (kps_all, centers, init_t_all, has_init,
                  betas0_all, pose0_all, orient0_all, anchor_all)
        if self.bucket:
            B = 1 << max(N - 1, 0).bit_length()
            if B != N:
                inputs = tuple(
                    jnp.concatenate(
                        [x, jnp.broadcast_to(x[:1], (B - N,) + x.shape[1:])])
                    for x in inputs)
        if mesh is not None:
            from tpubody.dist import mesh as mesh_lib
            n_dev = len(mesh.devices.ravel())
            inputs = tuple(mesh_lib.pad_frames(x, n_dev) for x in inputs)
            inputs = mesh_lib.shard_frames(inputs, mesh)
        cam_it, stage_it = self._budgets(cam_maxiters, stage_maxiters)
        out = jax.device_get(self._fitter(*inputs, cam_it, stage_it))

        return FitBatchOutput(
            pose=out["pose"][:N],
            shape=out["shape"][:N],
            camera_translation=out["cam_t"][:N],
            camera_center=centers_np,
            camera_fx=self.config.focal_length,
            pose_embedding=out["emb"][:N],
            loss=out["loss"][:N],
            expression=(out["expression"][:N] if self.n_expr else None),
        )


# Identity-keyed cache for the convenience path: fit_frames called twice
# with the same (model, config, dec_params) objects reuses one compiled
# program.  The fitter holds strong refs to its keys, so ids cannot be
# recycled while an entry lives; an identity check guards the lookup.
_FITTER_CACHE: dict = {}


def _cached_fitter(model, config, dec_params, rng) -> "BatchFitter":
    """The identity-keyed BatchFitter cache shared by fit_frames and
    chained fit_sequence (the compile costs minutes on a TPU host)."""
    key = (id(model), config, id(dec_params) if dec_params is not None
           else None)
    fitter = _FITTER_CACHE.get(key)
    if (fitter is None or fitter.model is not model
            or (dec_params is not None
                and fitter.dec_params is not dec_params)):
        if len(_FITTER_CACHE) > 8:      # bound baked-constant memory
            _FITTER_CACHE.clear()
        fitter = BatchFitter(model, config, dec_params=dec_params, rng=rng)
        _FITTER_CACHE[key] = fitter
    return fitter


def fit_frames(
    model: params_lib.BodyModelParams,
    keypoints: np.ndarray,           # (N, 67, 3)
    camera_centers: np.ndarray,      # (N, 2) or (2,)
    config: FitConfig = FitConfig(),
    dec_params=None,
    rng: Optional[jax.Array] = None,
    init_cam_t: Optional[np.ndarray] = None,   # (N, 3)
    init_params: Optional[dict] = None,        # leading N axis per entry
    mesh=None,
) -> FitBatchOutput:
    """Batched SMPLify: fit N frames of keypoints in ONE compiled program.

    TPU-first beyond the reference (which fits frames one at a time
    through a python loop, lib/gen_smplh.py:179-185): the entire staged
    fit — camera init, both orientation candidates, the full weighted
    stage schedule, every L-BFGS while_loop — is ``vmap``-ped over the
    frame axis, so one chip optimizes the whole batch in parallel and a
    multi-chip ``mesh`` (dist.mesh) shards frames over devices.

    Semantics vs ``fit_frame``: identical losses and schedule.  The only
    difference is the 180° flip test — fit_frame decides on the host
    whether to *evaluate* the flipped candidate; here both candidates are
    always evaluated (lanes run in lockstep under vmap anyway) and the
    flip is *selected* per-frame only where try_both_orient or the
    side-view shoulder test allows it, matching the reference's selection
    rule (fit_single_frame.py:337-356).

    Repeated calls with the same ``model``/``config``/``dec_params``
    objects reuse one compiled program (construct a :class:`BatchFitter`
    directly for explicit control of that lifetime).
    """
    fitter = _cached_fitter(model, config, dec_params, rng)
    return fitter(keypoints, camera_centers, init_cam_t=init_cam_t,
                  init_params=init_params, mesh=mesh)


def fit_sequence(
    model: params_lib.BodyModelParams,
    keypoints_seq: np.ndarray,       # (T, 67, 3)
    camera_centers: np.ndarray,      # (T, 2) or (2,)
    config: FitConfig = FitConfig(),
    dec_params=None,
    rng: Optional[jax.Array] = None,
    chained: bool = True,
    mesh=None,
    block: int = 1,
) -> FitBatchOutput:
    """Video fitting: T keypoint frames -> per-frame SMPLH fits.

    ``chained=True`` (default): frames warm-start from the previous
    solution (camera, orientation, shape, pose) — temporal coherence for
    video.  ``block`` sets the chaining granularity: 1 fits one frame
    per dispatch (strict frame-to-frame warm starts); ``block=B`` fits B
    frames per batched dispatch, all warm-started from the previous
    block's last solution — on TPU the batched dispatch amortizes the
    per-call overhead that dominates single-frame fitting (measured
    119.6 ms/frame at block=1 vs 47 ms/frame batched; block=8 keeps the
    warm-start truncated budget AND the batch).  ``chained=False``: all
    frames fit independently in one batched (mesh-shardable) program —
    no temporal coupling.
    """
    kps = np.asarray(keypoints_seq, np.float32)
    T = kps.shape[0]
    centers = np.broadcast_to(
        np.asarray(camera_centers, np.float32), (T, 2))
    if not chained:
        return fit_frames(model, kps, centers, config,
                          dec_params=dec_params, rng=rng, mesh=mesh)

    fitter = _cached_fitter(model, config, dec_params, rng)
    pose_key = fitter.pose_key
    step = max(1, int(block))
    outs = []
    prev: Optional[FitBatchOutput] = None
    for s in range(0, T, step):
        kb = kps[s:s + step]
        cb = centers[s:s + step]
        n_real = kb.shape[0]
        if n_real < step:
            # Pad the tail block to the compiled block shape (repeat the
            # last frame; outputs trimmed below) — a ragged tail would
            # otherwise pay a second minutes-long staged-fit compile.
            kb = np.concatenate(
                [kb, np.repeat(kb[-1:], step - n_real, axis=0)])
            cb = np.concatenate(
                [cb, np.repeat(cb[-1:], step - n_real, axis=0)])
        n = kb.shape[0]
        ip = None
        ict = None
        aw = None
        cam_it = None
        stage_it = None
        if prev is not None:
            # Every lane of this block starts from the previous block's
            # LAST solution (for block=1 that is exactly the previous
            # frame).
            def rep(a):
                return np.repeat(np.asarray(a)[-1:], n, axis=0)

            ip = {
                "global_orient": rep(prev.pose[:, :3]),
                "betas": rep(prev.shape),
                pose_key: rep(prev.pose_embedding if config.use_vposer
                              else prev.pose[:, 3:3 + fitter.body_dim]),
            }
            ict = rep(prev.camera_translation)
            # Temporal smoothing: anchor this block's pose/orientation to
            # the previous solution (config.temporal_weight; 0 = off).
            aw = np.full((n,), config.temporal_weight, np.float32)
            # Warm-started frames run a truncated budget (traced operands
            # through the SAME compiled program; config.warm_maxiters).
            # warm_cam_maxiters=0 means "inherit the previous frame's
            # camera" — correct frame-to-frame, but a block inherits ONE
            # camera for all its lanes, so block mode keeps the camera
            # stage running at the warm budget.
            if config.warm_maxiters is not None:
                cam_it = (config.warm_cam_maxiters if step == 1
                          else (config.warm_cam_maxiters
                                or config.warm_maxiters))
                stage_it = config.warm_maxiters
        prev = fitter(kb, cb,
                      init_cam_t=ict, init_params=ip, anchor_weight=aw,
                      cam_maxiters=cam_it, stage_maxiters=stage_it)
        if n_real < n:   # drop the tail block's padding lanes
            prev = FitBatchOutput(*[
                (v[:n_real] if isinstance(v, np.ndarray)
                 and getattr(v, "ndim", 0) >= 1 and v.shape[0] == n else v)
                for v in prev])
        outs.append(prev)
    return FitBatchOutput(
        pose=np.concatenate([o.pose for o in outs]),
        shape=np.concatenate([o.shape for o in outs]),
        camera_translation=np.concatenate(
            [o.camera_translation for o in outs]),
        camera_center=np.concatenate([o.camera_center for o in outs]),
        camera_fx=config.focal_length,
        pose_embedding=np.concatenate([o.pose_embedding for o in outs]),
        loss=np.concatenate([o.loss for o in outs]),
        expression=(np.concatenate([o.expression for o in outs])
                    if outs[0].expression is not None else None),
    )

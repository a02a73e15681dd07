"""Command-line interface: the reference's three entry points.

  tpubody gen-smplh  <img> <keypoints.json> <out_dir>   (lib/gen_smplh.py)
  tpubody reconstruct <test_dir> [--out <dir>]          (main.py)
  tpubody animate     <avatar.pkl> <clip> <out.mp4>     (lib/model2video*.py)

Run as ``python -m tpubody.cli <command> ...``.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _cmd_gen_smplh(args) -> int:
    from tpubody.pipelines import gen_smplh
    fit = gen_smplh.gen_smplh(args.img, args.keypoints, args.out,
                              config_yaml=args.config)
    print(f"wrote {os.path.join(args.out, 'smplh.pkl')}  "
          f"(loss artifacts alongside)")
    return 0


def _cmd_gen_smplh_batch(args) -> int:
    """Batched fitting over fixture dirs (reference lib/gen_smplh.py:179-185
    loops serially; tpubody fits all frames in one vmapped program)."""
    from tpubody.pipelines import gen_smplh

    items = []
    for d in args.dirs:
        img = os.path.join(d, "front_rgb.png")
        keyp = os.path.join(d, "0_keypoints.json")
        if not (os.path.exists(img) and os.path.exists(keyp)):
            print(f"skipping {d}: needs front_rgb.png + 0_keypoints.json",
                  file=sys.stderr)
            continue
        out = os.path.join(args.out_root, os.path.basename(
            os.path.normpath(d))) if args.out_root else d
        items.append((img, keyp, out))
    if not items:
        print("no valid fixture dirs", file=sys.stderr)
        return 1
    mesh = None
    if args.shard and len(items) > 1:
        import jax

        from tpubody.dist import mesh as mesh_lib
        if len(jax.devices()) > 1:
            mesh = mesh_lib.make_mesh()
    results = gen_smplh.gen_smplh_batch(items, config_yaml=args.config,
                                        mesh=mesh)
    for (img, _, out), fit in zip(items, results):
        print(f"wrote {os.path.join(out, 'smplh.pkl')}")
    return 0


def _cmd_refine(args) -> int:
    """HMR-warm-started SMPLify (SPIN-style regress-then-optimize)."""
    from tpubody.pipelines import refine as refine_lib

    refine_lib.refine(
        [(args.img, args.keypoints, args.out)],
        config_yaml=args.config, hmr_ckpt=args.hmr_ckpt)
    print(f"wrote {os.path.join(args.out, 'smplh.pkl')} "
          "(artifacts alongside)")
    return 0


def _cmd_reconstruct(args) -> int:
    from tpubody.models import params as params_lib
    from tpubody.pipelines import reconstruct as rec
    from tpubody.utils.profiling import StageTimer

    front, back, mask, fit = rec.load_test_dir(args.path)
    out_dir = args.out or args.path

    def load_or_synth(kind, n_joints):
        return params_lib.load_or_synthetic(kind, n_joints=n_joints)

    timer = StageTimer()
    rec.reconstruct(front, back, mask, fit,
                    load_or_synth("smplh", 52), load_or_synth("smpl", 24),
                    out_dir=out_dir, replace_hands=args.replace_hands,
                    timer=timer)
    print(timer.report())
    print(f"wrote avatar + mesh artifacts to {out_dir}")
    return 0


def _load_clip(clip_path, asf=None, stride=1):
    """Load a motion clip by extension: AMASS .npz, CMU .amc (+ --asf), or a
    Mixamo result.pkl (which always plays at stride 1, model2video_miaxmo
    convention).  Returns (MotionClip, effective stride)."""
    from tpubody.io import motion as motion_lib

    if clip_path.endswith(".npz"):
        return motion_lib.read_amass(clip_path), stride
    if clip_path.endswith(".amc"):
        if not asf:
            raise SystemExit("--asf <skeleton.asf> is required for .amc clips")
        from tpubody.io import asf as asf_lib
        return asf_lib.read_amc(asf, clip_path), stride
    return motion_lib.read_mixamo(clip_path), 1


def _cmd_animate(args) -> int:
    from tpubody.mesh import rigging
    from tpubody.pipelines import animate

    avatar = rigging.load_avatar(args.avatar)
    if args.decimate:
        from tpubody.mesh import decimate
        avatar = decimate.decimate_avatar(avatar, target_verts=args.decimate)
    clip, stride = _load_clip(args.clip, args.asf, args.stride)
    animate.animate_video(avatar, clip, args.out, size=args.size,
                          fps=args.fps, stride=stride,
                          cam_t=np.asarray([0.0, 0.0, args.cam_z]))
    print(f"wrote {args.out}")
    return 0


def _cmd_fit_video(args) -> int:
    """Fit a keypoint sequence (sorted OpenPose JSONs) with temporal
    warm-start chaining + optional anchor smoothing; writes an .npz of
    per-frame fits and optionally a Mixamo-format result.pkl that
    `animate` consumes directly."""
    import glob as glob_lib

    from tpubody.fit import keypoints as kp_lib
    from tpubody.fit import smplify
    from tpubody.io import motion as motion_lib
    from tpubody.models import params as params_lib
    from tpubody.pipelines import gen_smplh as gen_lib

    paths = sorted(glob_lib.glob(args.keypoints))
    if not paths:
        raise SystemExit(f"no keypoint files match {args.keypoints!r}")

    config = gen_lib.load_config(args.config)
    if args.temporal_weight is not None:
        import dataclasses
        config = dataclasses.replace(
            config, temporal_weight=args.temporal_weight)
    kps = np.stack([
        kp_lib.read_openpose_json(
            p, use_hands=gen_lib._hands(config),
            use_face=gen_lib._face(config),
            use_face_contour=config.use_face_contour).keypoints
        for p in paths])
    model = params_lib.load_or_synthetic(
        config.model_type,
        n_joints=gen_lib._FAMILY_JOINTS[config.model_type],
        n_verts=args.verts)
    center = np.asarray([args.cx, args.cy], np.float64)
    out = smplify.fit_sequence(model, kps.astype(np.float32), center,
                               config, chained=not args.independent)
    np.savez(args.out, pose=out.pose, shape=out.shape,
             camera_translation=out.camera_translation,
             camera_center=out.camera_center, loss=out.loss,
             camera_fx=out.camera_fx)
    print(f"wrote {args.out} ({out.pose.shape[0]} frames, "
          f"mean loss {float(np.mean(out.loss)):.3f})")
    if args.clip_out:
        # SMPL-24 clip: a (T,72) SMPL fit reshapes directly; an SMPLH fit
        # takes global+body joints with zero hands (slicing [:72] would
        # leak left-finger rotations into slots 22/23).
        pose24 = (out.pose.reshape(-1, 24, 3) if out.pose.shape[1] == 72
                  else motion_lib.smplh156_to_smpl24(out.pose))
        motion_lib.save_mixamo(
            args.clip_out, pose24,
            cam=out.camera_translation, fps=args.fps)
        print(f"wrote {args.clip_out} (animate-compatible clip)")
    return 0


def _cmd_demo(args) -> int:
    from tpubody.pipelines import demo as demo_lib

    arts = demo_lib.run_demo(
        args.out, size=args.size, verts=args.verts, seed=args.seed,
        fit=args.fit, animate_frames=args.frames)
    for name, path in sorted(arts.items()):
        print(f"  {name}: {path}")
    print(f"demo fixture + reconstruction in {args.out} "
          f"(reusable: `tpubody reconstruct {args.out}`)")
    return 0


def _cmd_export_glb(args) -> int:
    from tpubody.mesh import gltf as gltf_lib
    from tpubody.mesh import rigging

    avatar = rigging.load_avatar(args.avatar)
    poses = trans = None
    fps = args.fps
    if args.clip:
        clip, stride = _load_clip(args.clip, args.asf, args.stride)
        poses = clip.poses[::stride]
        trans = clip.trans[::stride]
        if fps is None:
            fps = clip.fps / stride
    gltf_lib.export_avatar_glb(
        args.out, avatar, poses=poses, trans=trans, fps=fps or 30.0,
        max_influences=args.max_influences)
    print(f"wrote {args.out}")
    return 0


def _cmd_infer(args) -> int:
    """Images -> HMR -> SMPL meshes (OBJ/PLY per image) — the flagship
    batched-inference path (pipelines/hmr_infer.py) from the CLI."""
    from tpubody.mesh import meshio
    from tpubody.models import params as params_lib
    from tpubody.pipelines import hmr_infer

    smpl = params_lib.load(args.smpl) if args.smpl else None
    predictor = hmr_infer.HMRPredictor(smpl_model=smpl)
    if args.torch_ckpt:
        predictor.load_torch_checkpoint(args.torch_ckpt)
    result = predictor.from_files(args.images)
    os.makedirs(args.out, exist_ok=True)
    faces = np.asarray(predictor.smpl.faces)
    for i, p in enumerate(args.images):
        stem = os.path.splitext(os.path.basename(p))[0]
        verts = np.asarray(result.verts[i])
        out_path = os.path.join(args.out, stem + "." + args.format)
        if args.format == "obj":
            meshio.write_obj(out_path, verts, faces)
        else:
            meshio.write_ply(out_path, verts, faces)
        print(f"wrote {out_path}")
    np.savez(os.path.join(args.out, "params.npz"),
             rotmats=np.asarray(result.rotmats),
             shape=np.asarray(result.shape),
             cam=np.asarray(result.cam),
             cam_t=np.asarray(result.cam_t))
    return 0


def _cmd_train_pose2d(args) -> int:
    """Renderer-supervised pose2d training (pipelines/pose_train.py);
    saves a checkpoint consumable by detect-pose --ckpt."""
    from tpubody.pipelines import pose_train
    from tpubody.utils import checkpoint as ckpt_lib

    init_params = None
    if getattr(args, "resume", None):
        init_params = ckpt_lib.restore_pytree(args.resume)["variables"]
        print(f"resuming from {args.resume}")

    # Bundle the architecture with the weights so detect-pose can rebuild
    # the exact model (the synthetic trainer uses the body's joint count —
    # its n_joints default — not the 67-slot OpenPose layout).
    n_kp = 24

    def save(variables):
        ckpt_lib.save_pytree(args.out, {
            "variables": variables,
            "meta": {"n_keypoints": np.asarray(n_kp),
                     "features": np.asarray(args.features)},
        })

    chunk = max(1, getattr(args, "chunk", 100))
    save_every = max(chunk, getattr(args, "save_every", 500))

    def on_chunk(variables, done):
        # Periodic checkpointing: a crashed device worker costs at most
        # save_every steps, and --resume continues from the last save.
        # (done advances in `chunk`-step increments, so the window must
        # scale with the chunk size.)
        if done % save_every < chunk:
            save(variables)

    res = pose_train.train_pose2d_synthetic(
        steps=args.steps, batch=args.batch, size=args.size,
        features=args.features, lr=args.lr,
        domain_rand=getattr(args, "domain_rand", False),
        init_params=init_params, on_chunk=on_chunk,
        chunk=getattr(args, "chunk", 100))
    assert int(res.model.n_keypoints) == n_kp
    save(res.params)
    print(f"pixel err: {res.pixel_err_before:.2f} -> "
          f"{res.pixel_err_after:.2f} px over {args.steps} steps")
    print(f"wrote checkpoint to {args.out}")
    return 0


def _cmd_train_hmr(args) -> int:
    """Train HMR with the input pipeline; saves an orbax checkpoint.

    Data: an .npz with images (N,S,S,3), keypoints2d (N,24,3) and optional
    gt_rotmats (N,24,3,3) / gt_shape (N,10) — or --synthetic N for a
    self-contained smoke run."""
    import jax
    import jax.numpy as jnp
    import optax

    from tpubody.io import dataset as ds
    from tpubody.models import hmr as hmr_lib
    from tpubody.models import hmr_train
    from tpubody.models import params as params_lib
    from tpubody.utils import checkpoint as ckpt_lib

    if getattr(args, "render", 0):
        data = ds.ArrayDataset([
            ds.preprocess_example(e, size=args.size)
            for e in ds.rendered_hmr_dataset(
                args.render, image_size=args.size + 16)._examples])
    elif args.synthetic:
        data = ds.ArrayDataset([
            ds.preprocess_example(e, size=args.size)
            for e in ds.synthetic_hmr_dataset(
                args.synthetic, image_size=args.size + 16)._examples])
    else:
        z = np.load(args.data)
        n = len(z["images"])
        data = ds.ArrayDataset([
            ds.HMRExample(
                z["images"][i], z["keypoints2d"][i],
                z["gt_rotmats"][i] if "gt_rotmats" in z else None,
                z["gt_shape"][i] if "gt_shape" in z else None)
            for i in range(n)])

    model = hmr_lib.HMR(mean_params=hmr_lib.default_mean_params(),
                        n_iter=3, dtype=jnp.float32,
                        remat=getattr(args, "remat", False))
    if getattr(args, "render", 0):
        # --render labels come from the capsule humanoid; the reprojection
        # loss / 3D eval must use the SAME body or their targets are
        # unreachable.
        from tpubody.models import humanoid as humanoid_lib
        smpl = humanoid_lib.humanoid(
            n_joints=24, n_verts=max(args.verts, 1200), seed=0)
    else:
        smpl = params_lib.synthetic(n_joints=24, n_verts=args.verts, seed=0)
    tx = optax.adam(args.lr)
    state = hmr_train.create_train_state(model, tx, image_size=args.size)
    step = jax.jit(hmr_train.make_train_step(
        model, smpl, tx, img_size=float(args.size)))

    from tpubody.utils.metrics import MetricsLogger

    loader = ds.DeviceLoader(
        data, batch_size=args.batch, num_epochs=None, seed=0,
        transforms=[lambda e, r: ds.random_flip(e, r)])
    rng = jax.random.PRNGKey(0)
    it = iter(loader)
    with MetricsLogger(os.path.join(args.out + "_metrics.jsonl")) as mlog:
        for i in range(args.steps):
            batch = next(it)
            rng, k = jax.random.split(rng)
            state, metrics = step(state, batch, k)
            mlog.log("train", step=i, loss=float(metrics["loss"]))
            if i % max(1, args.steps // 10) == 0:
                print(f"step {i}: loss {float(metrics['loss']):.4f}")
        # Final 3D eval (MPJPE/PA-MPJPE/PVE, utils.pose_eval) on a fresh
        # batch when the data carries GT SMPL parameters.
        batch = next(it)
        if float(jnp.sum(batch.has_smpl)) > 0:
            ev = jax.jit(hmr_train.make_eval_step(model, smpl))(state, batch)
            ev = {k: float(v) for k, v in ev.items()}
            mlog.log("eval", step=args.steps, **ev)
            print("eval: " + "  ".join(f"{k} {v:.4f}" for k, v in ev.items()))
    ckpt_lib.save_train_state(args.out, state)
    print(f"saved checkpoint to {args.out}")
    return 0


def _cmd_detect_pose(args) -> int:
    """Image -> 0_keypoints.json via the in-framework detector (the
    reference's lib/openpose.py openpose(img, save) contract)."""
    import json

    import jax.numpy as jnp

    from tpubody.image import ops as img_ops
    from tpubody.models import pose2d

    img = img_ops.read_image(args.img)
    H = W = args.size
    inp = img_ops.scale_and_crop(
        img, (img.shape[1] / 2.0, img.shape[0] / 2.0),
        max(img.shape[:2]) / 200.0, H)
    # shape-init: either a checkpoint overwrites the variables, or the
    # untrained-weights warning below applies — no need to pay the real
    # init's XLA compile at CLI cold-start.
    if args.ckpt:
        from tpubody.utils import checkpoint as ckpt_lib
        raw = ckpt_lib.restore_pytree(args.ckpt)
        if isinstance(raw, dict) and "meta" in raw:
            meta = raw["meta"]
            model, _ = pose2d.create_pose2d(
                n_keypoints=int(np.asarray(meta["n_keypoints"])),
                features=int(np.asarray(meta["features"])),
                image_size=H, init="shape")
            variables = raw["variables"]
        else:  # bare-variables checkpoint: must match the default arch
            model, variables = pose2d.create_pose2d(image_size=H,
                                                    init="shape")
            variables = ckpt_lib.restore_pytree(args.ckpt, variables)
    else:
        model, variables = pose2d.create_pose2d(image_size=H, init="shape")
        import sys
        print("WARNING: detect-pose is EXPERIMENTAL and running with "
              "untrained weights — keypoints will not be usable for "
              "fitting; train with `train-pose2d` and pass --ckpt.",
              file=sys.stderr)
    out = pose2d.detect(model, variables,
                        jnp.asarray(inp[None] / 255.0, jnp.float32))
    kp = np.asarray(out.keypoints[0], np.float64)
    # map from the square crop back to original pixels
    ratio = max(img.shape[:2]) / float(H)
    kp[:, 0] = kp[:, 0] * ratio + (img.shape[1] - max(img.shape[:2])) / 2.0
    kp[:, 1] = kp[:, 1] * ratio + (img.shape[0] - max(img.shape[:2])) / 2.0
    if kp.shape[0] < pose2d.N_KEYPOINTS:
        # models trained on fewer joints (synthetic bodies) fill the
        # leading body slots; the rest stay confidence-0
        pad = np.zeros((pose2d.N_KEYPOINTS - kp.shape[0], 3), np.float64)
        kp = np.concatenate([kp, pad], axis=0)
    person = pose2d.keypoints_to_openpose(kp)
    with open(args.out, "w") as f:
        json.dump({"version": 1.3, "people": [person]}, f)
    print(f"wrote {args.out}")
    return 0


def _cmd_animate_batch(args) -> int:
    from tpubody.pipelines import animate

    outs = animate.animate_mixamo_batch(
        args.avatar, args.mixamo_root, args.out_dir, prefix=args.prefix,
        size=args.size, cam_t=np.asarray([0.0, 0.0, args.cam_z]))
    for o in outs:
        print(f"wrote {o}")
    return 0


def _maybe_enable_compile_cache() -> None:
    """Opt-in persistent XLA compilation cache (TPUBODY_COMPILE_CACHE=dir).

    First jit compile of the big programs (ResNet init, fit loop, tiled
    rasterizer) costs 20-40 s on a TPU host; the cache cuts repeat CLI
    cold-starts to near-zero.  Off by default: on CPU hosts the cache's
    AOT machine-feature checks can mis-warn, and tests manage their own
    cache state."""
    cache_dir = os.environ.get("TPUBODY_COMPILE_CACHE")
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None) -> int:
    _maybe_enable_compile_cache()
    parser = argparse.ArgumentParser(prog="tpubody")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("gen-smplh", help="fit SMPLH to keypoints")
    p.add_argument("img")
    p.add_argument("keypoints")
    p.add_argument("out")
    p.add_argument("--config", default=None, help="YAML config overrides")
    p.set_defaults(fn=_cmd_gen_smplh)

    p = sub.add_parser(
        "refine",
        help="HMR-initialized SMPLify fit (regress-then-optimize)")
    p.add_argument("img")
    p.add_argument("keypoints")
    p.add_argument("out")
    p.add_argument("--config", default=None, help="YAML config overrides")
    p.add_argument("--hmr-ckpt", default=None,
                   help="torch HMR checkpoint to convert and use")
    p.set_defaults(fn=_cmd_refine)

    p = sub.add_parser(
        "gen-smplh-batch",
        help="fit SMPLH to many fixture dirs in one batched program")
    p.add_argument("dirs", nargs="+",
                   help="fixture dirs (front_rgb.png + 0_keypoints.json)")
    p.add_argument("--out-root", default=None,
                   help="write outputs under this root instead of in-place")
    p.add_argument("--config", default=None, help="YAML config overrides")
    p.add_argument("--shard", action="store_true",
                   help="shard the frame axis over all devices")
    p.set_defaults(fn=_cmd_gen_smplh_batch)

    p = sub.add_parser("reconstruct", help="full single-image reconstruction")
    p.add_argument("path", help="fixture dir with front/back/mask/smplh.pkl")
    p.add_argument("--out", default=None)
    p.add_argument("--replace-hands", action="store_true")
    p.set_defaults(fn=_cmd_reconstruct)

    p = sub.add_parser("animate", help="render avatar + motion clip to MP4")
    p.add_argument("avatar", help="rigged avatar pickle (or_recover.pkl)")
    p.add_argument("clip", help="AMASS .npz, Mixamo result.pkl, or CMU .amc")
    p.add_argument("--asf", default=None,
                   help="ASF skeleton file (required for .amc clips)")
    p.add_argument("out", help="output .mp4")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--fps", type=float, default=None)
    p.add_argument("--stride", type=int, default=2)
    p.add_argument("--cam-z", type=float, default=2.5)
    p.add_argument("--decimate", type=int, default=0,
                   help="cluster-decimate the avatar to ~N vertices first")
    p.set_defaults(fn=_cmd_animate)

    p = sub.add_parser(
        "fit-video",
        help="fit a keypoint sequence (video) with temporal chaining")
    p.add_argument("keypoints",
                   help="glob of OpenPose JSONs, e.g. 'frames/*_keypoints"
                        ".json' (sorted order = frame order)")
    p.add_argument("out", help="output .npz (pose/shape/camera per frame)")
    p.add_argument("--config", default=None, help="fitting conf.yaml")
    p.add_argument("--temporal-weight", type=float, default=None,
                   help="anchor each frame to the previous solution "
                        "(overrides config; 0 = off)")
    p.add_argument("--independent", action="store_true",
                   help="fit all frames independently in one batched "
                        "program instead of chaining")
    p.add_argument("--cx", type=float, default=512.0)
    p.add_argument("--cy", type=float, default=512.0)
    p.add_argument("--clip-out", default=None,
                   help="also write a Mixamo-format result.pkl for "
                        "`animate`")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--verts", type=int, default=6890,
                   help="synthetic-fallback vertex count (tests/benches)")
    p.set_defaults(fn=_cmd_fit_video)

    p = sub.add_parser(
        "demo",
        help="asset-free end-to-end demo: generate a reference-layout "
             "fixture from the capsule humanoid, reconstruct it (with "
             "hand grafting), animate a clip, export a skinned GLB")
    p.add_argument("out", help="output fixture/artifact directory")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--verts", type=int, default=3000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--fit", action="store_true",
                   help="re-fit smplh.pkl from the generated keypoints "
                        "(staged SMPLify) instead of using ground truth")
    p.set_defaults(fn=_cmd_demo)

    p = sub.add_parser(
        "export-glb",
        help="export a rigged avatar (+ optional motion clip) as a "
             "skinned glTF binary")
    p.add_argument("avatar", help="rigged avatar pickle (or_recover.pkl)")
    p.add_argument("out", help="output .glb")
    p.add_argument("--clip", default=None,
                   help="AMASS .npz, Mixamo result.pkl, or CMU .amc to "
                        "embed as a glTF animation")
    p.add_argument("--asf", default=None,
                   help="ASF skeleton file (required for .amc clips)")
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--fps", type=float, default=None,
                   help="animation sample rate (default: the clip's)")
    p.add_argument("--max-influences", type=int, default=8,
                   help="skin influences kept per vertex (vec4 sets)")
    p.set_defaults(fn=_cmd_export_glb)

    p = sub.add_parser(
        "animate-batch",
        help="render every Mixamo clip under a directory tree to MP4s")
    p.add_argument("avatar", help="rigged avatar pickle (or_recover.pkl)")
    p.add_argument("mixamo_root",
                   help="directory of clip subdirs holding result.pkl")
    p.add_argument("out_dir", help="output directory for <prefix><clip>.mp4")
    p.add_argument("--prefix", default="or_")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--cam-z", type=float, default=2.5)
    p.set_defaults(fn=_cmd_animate_batch)

    p = sub.add_parser(
        "detect-pose",
        help="[EXPERIMENTAL] detect 2D keypoints -> OpenPose-format JSON "
             "(lib/openpose.py); without a trained --ckpt the detector is "
             "untrained and its keypoints are not usable for fitting")
    p.add_argument("img")
    p.add_argument("out", help="output keypoints .json")
    p.add_argument("--size", type=int, default=256,
                   help="square inference resolution")
    p.add_argument("--ckpt", default=None,
                   help="trained pose2d checkpoint (orbax)")
    p.set_defaults(fn=_cmd_detect_pose)

    p = sub.add_parser("infer",
                       help="images -> HMR -> SMPL meshes (batched)")
    p.add_argument("images", nargs="+", help="input image files")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--format", choices=("obj", "ply"), default="obj")
    p.add_argument("--torch-ckpt", default=None,
                   help="reference torch HMR checkpoint to convert")
    p.add_argument("--smpl", default=None,
                   help="SMPL model file (pkl/npz); defaults to the "
                        "conventional asset spots / TPUBODY_SMPL_PATH, "
                        "then a synthetic stand-in with a warning")
    p.set_defaults(fn=_cmd_infer)

    p = sub.add_parser(
        "train-pose2d",
        help="[EXPERIMENTAL] train the 2D keypoint detector on rendered "
             "synthetic bodies; saves an orbax checkpoint for detect-pose")
    p.add_argument("--out", required=True, help="checkpoint output dir")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--features", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--domain-rand", action="store_true",
                   help="randomize orientation/camera/background/photometry/"
                        "occlusion for transfer (pose_train.make_synthesizer)")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir to resume variables from")
    p.add_argument("--save-every", type=int, default=500,
                   help="checkpoint every N steps (crash costs at most N)")
    p.add_argument("--chunk", type=int, default=100,
                   help="steps per compiled scan program (smaller keeps "
                        "the program within toolchain limits)")
    p.set_defaults(fn=_cmd_train_pose2d)

    p = sub.add_parser("train-hmr",
                       help="train HMR (keypoint + SMPL supervision)")
    p.add_argument("--data", default=None, help="dataset .npz")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic (noise-image) examples instead "
                        "of --data")
    p.add_argument("--render", type=int, default=0,
                   help="use N renderer-supervised humanoid examples "
                        "(true rotmat/shape/keypoint labels)")
    p.add_argument("--out", required=True, help="checkpoint output dir")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--verts", type=int, default=6890)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks on backward "
                        "(less activation memory, larger batches)")
    p.set_defaults(fn=_cmd_train_hmr)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""Evaluation CLI — parity with code/evaluation/eval.py:17-304.

    python -m hashmodnffbanks_idr_tpu.eval.run_eval \
        --conf <conf> --scan_id 65 [--checkpoint latest] [--resolution 400] \
        [--eval_rendering] [--eval_cameras] [--timestamp latest]

Loads the latest (or named) checkpoint of the experiment, exports the
world-coordinate surface mesh, and optionally re-renders all train views for
PSNR/SSIM/LPIPS CSVs and reports trained-camera accuracy.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def find_run_dir(exps_folder: str, expname: str, timestamp: str) -> str:
    expdir = os.path.join(exps_folder, expname)
    if timestamp == "latest":
        stamps = sorted(os.listdir(expdir))
        if not stamps:
            raise FileNotFoundError(f"no runs in {expdir}")
        return os.path.join(expdir, stamps[-1])
    return os.path.join(expdir, timestamp)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--conf", required=True)
    p.add_argument("--expname", default="")
    p.add_argument("--exps_folder", default="exps")
    p.add_argument("--evals_folder", default="evals")
    p.add_argument("--scan_id", type=int, default=-1)
    p.add_argument("--timestamp", default="latest")
    p.add_argument("--checkpoint", default="latest")
    p.add_argument("--resolution", type=int, default=400)
    p.add_argument("--eval_rendering", action="store_true")
    p.add_argument("--eval_cameras", action="store_true")
    p.add_argument("--is_uniform_grid", action="store_true")
    p.add_argument("--data_root", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--views", type=int, nargs="+", default=None,
                   help="render only these view ids (default: all); use the "
                        "same subset on both sides of a comparison")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..config.hocon import parse_file
    from ..models.renderer import IDRNetwork
    from ..train import checkpoints as ckpt
    from .evaluator import Evaluator, camera_alignment

    conf = parse_file(args.conf)
    scan_id = args.scan_id if args.scan_id != -1 else conf.get_int("dataset.scan_id", -1)
    # non-empty --expname REPLACES the conf expname (matching
    # train.exp_runner; deviation from the reference's append semantics)
    expname = args.expname or conf.get_string("train.expname")
    if args.expname and args.expname != conf.get_string("train.expname"):
        print(f"[expname] '--expname {args.expname}' REPLACES the conf "
              f"expname '{conf.get_string('train.expname')}'")
    if scan_id != -1:
        expname += f"_{scan_id}"

    run_dir = find_run_dir(args.exps_folder, expname, args.timestamp)
    train_cameras = "trained" in conf.get_string("train.expname")

    model = IDRNetwork(conf.get_config("model"))
    params_template = model.init(jax.random.PRNGKey(0))
    state_t = {"params": params_template}
    loaded = ckpt.load_checkpoint(os.path.join(run_dir, "checkpoints"),
                                  args.checkpoint)
    epoch = int(loaded.get("epoch", 0))
    from flax import serialization

    params = serialization.from_state_dict(params_template, loaded["params"])
    pose_vecs = loaded.get("pose_vecs")
    if pose_vecs is not None:
        pose_vecs = np.asarray(
            serialization.from_state_dict(np.zeros_like(np.asarray(pose_vecs)), pose_vecs)
            if not isinstance(pose_vecs, np.ndarray) else pose_vecs)

    ev = Evaluator(conf, params, train_cameras=train_cameras and pose_vecs is not None,
                   pose_vecs=pose_vecs, data_root=args.data_root, scan_id=scan_id)

    eval_dir = os.path.join(args.evals_folder, expname)
    os.makedirs(eval_dir, exist_ok=True)

    mesh_path = os.path.join(eval_dir, f"surface_world_coordinates_{epoch}.ply")
    ev.export_mesh(mesh_path, epoch=epoch, resolution=args.resolution)
    print(f"mesh -> {mesh_path}")

    if args.eval_cameras and pose_vecs is not None:
        from ..geometry.cameras import quat_to_rot
        import jax.numpy as jnp

        gt_pose = ev.dataset.get_gt_pose(scaled=True)
        pred_R = np.asarray(quat_to_rot(jnp.asarray(pose_vecs[:, :4])))
        res = camera_alignment(pred_R, gt_pose[:, :3, :3],
                               pose_vecs[:, 4:], gt_pose[:, :3, 3])
        line = (f"camera accuracy: rot mean {res['rot_err_mean']:.3f}deg "
                f"median {res['rot_err_median']:.3f}deg; "
                f"t mean {res['t_err_mean']:.4f} median {res['t_err_median']:.4f}")
        print(line)
        # persist the alignment report next to the other eval artifacts
        # (reference protocol: eval.py:208-251 prints + the numbers end up in
        # the paper tables; we keep a machine-readable copy)
        with open(os.path.join(eval_dir, "camera_accuracy.txt"), "w") as f:
            f.write(line + "\n")
        import json as _json

        with open(os.path.join(eval_dir, "camera_accuracy.json"), "w") as f:
            _json.dump({k: (v.tolist() if isinstance(v, np.ndarray) else v)
                        for k, v in res.items()}, f, indent=1)

    if args.eval_rendering:
        metrics = ev.eval_rendering(eval_dir, views=args.views)
        print(f"rendering: PSNR {metrics['psnr_mean']:.2f} "
              f"SSIM {metrics['ssim_mean']:.4f} LPIPS {metrics['lpips_mean']:.4f}")
        # machine-readable roll-up matching the head-to-head harness
        # (scripts/reference_headtohead.py writes the same file)
        import json as _json

        from ..models.lpips import weights_source

        summary = {k: v for k, v in metrics.items()
                   if isinstance(v, (int, float, str, list))}
        summary.update({"epoch": epoch, "lpips_weights": weights_source(),
                        "views": args.views or "all"})
        with open(os.path.join(eval_dir, "metrics", "summary.json"), "w") as f:
            _json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])

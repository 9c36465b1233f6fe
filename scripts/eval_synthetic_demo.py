#!/usr/bin/env python
"""Evaluate a synthetic-demo SLAM run against the analytic GT scene.

Produces the README quality table (the evaluation contract of
ref: src/tools/eval_recon.py:99-125 applied to the self-contained scene):
  - 3D acc / comp / completion-ratio of mesh/final_mesh_eval_rec.ply vs the
    trajectory-culled analytic GT mesh
  - ATE RMSE from the last checkpoint (tracking runs)
  - 2D depth-L1 (faithful reference protocol) when the native rasterizer
    is available

Usage:
    python scripts/eval_synthetic_demo.py <config.yaml> <output_dir>
        [--mesh final_mesh_eval_rec.ply] [--n_imgs 0 (2D views; 0=skip)]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("output_dir")
    ap.add_argument("--mesh", default="final_mesh_eval_rec.ply")
    ap.add_argument("--gt_resolution", type=int, default=192)
    ap.add_argument("--n_imgs", type=int, default=0)
    args = ap.parse_args()

    from attentive_dfprior_tpu.config import default_config_path, load_config
    from attentive_dfprior_tpu.tools.cull_mesh import cull_mesh, unseen_pointcloud
    from attentive_dfprior_tpu.tools.eval_recon import calc_2d_metric, calc_3d_metric
    from attentive_dfprior_tpu.utils.ply import read_ply
    from attentive_dfprior_tpu.utils.synthetic import SyntheticScene

    cfg = load_config(args.config, default_config_path())
    scene = SyntheticScene.from_config(cfg)
    gt_v, gt_f, _ = scene.gt_mesh(resolution=args.gt_resolution)

    rec_path = os.path.join(args.output_dir, "mesh", args.mesh)
    if not os.path.exists(rec_path):
        alt = os.path.join(args.output_dir, "mesh", "final_mesh.ply")
        print(f"{rec_path} missing; using {alt}")
        rec_path = alt
    rec_v, rec_f, _ = read_ply(rec_path)

    # trajectory-culled GT (the reference evaluates against culled GT meshes)
    ckpts = sorted(
        f for f in os.listdir(os.path.join(args.output_dir, "ckpts"))
        if f.endswith(".npz")
    )
    ck = np.load(os.path.join(args.output_dir, "ckpts", ckpts[-1]),
                 allow_pickle=True)
    gt_poses = ck["gt_c2w_list"]
    cam = cfg["cam"]
    cam_kw = dict(H=int(cam["H"]), W=int(cam["W"]), fx=float(cam["fx"]),
                  fy=float(cam["fy"]), cx=float(cam["cx"]), cy=float(cam["cy"]))
    gt_cv, gt_cf = cull_mesh(gt_v, gt_f, gt_poses, **cam_kw)

    out = {"mesh": rec_path, "n_rec_verts": len(rec_v),
           "n_gt_culled_verts": len(gt_cv)}
    out["metrics_3d"] = calc_3d_metric(rec_v, rec_f, gt_cv, gt_cf,
                                       n_samples=200_000)

    # ATE (only meaningful when tracking was real)
    est = ck["estimate_c2w_list"]
    n = int(ck["idx"]) + 1
    t_err = np.linalg.norm(est[:n, :3, 3] - gt_poses[:n, :3, 3], axis=1)
    out["ate_rmse_cm_unaligned"] = float(np.sqrt((t_err ** 2).mean()) * 100)
    try:
        from attentive_dfprior_tpu.tools.eval_ate import evaluate_ate

        stamps = list(range(n))
        gt_assoc = {float(i): gt_poses[i] for i in stamps
                    if np.isfinite(gt_poses[i]).all()}
        est_assoc = {float(i): est[i] for i in stamps}
        res = evaluate_ate(gt_assoc, est_assoc)
        out["ate_rmse_cm"] = float(res["absolute_translational_error.rmse"] * 100)
    except Exception as e:  # pragma: no cover
        out["ate_error"] = str(e)

    if args.n_imgs > 0:
        pc_unseen = unseen_pointcloud(gt_v, gt_f, gt_poses, **cam_kw)
        m2d = calc_2d_metric(rec_v, rec_f, gt_cv, gt_cf, pc_unseen=pc_unseen,
                             n_imgs=args.n_imgs)
        out["metrics_2d"] = m2d

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

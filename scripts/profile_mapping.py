#!/usr/bin/env python
"""Profile one mapping iteration on the TPU: where do the ms/iter go?

(VERDICT r2 'Next round' item 2.) Methodology: the relay acknowledges async
dispatches without completing them, so this script first forces the truthful
synchronous mode (one host fetch), then times jit'd lax.scan loops at two
lengths and reports the MARGINAL per-iteration cost (slope), which cancels
both the per-dispatch relay RTT and any fixed setup inside the executable.
All large arrays (frames, TSDF volume, grids) are jit ARGUMENTS, never
closures — closed-over arrays become HLO constants and blow past the
remote-compile request size limit.

Pieces timed (reference Replica color-stage workload: 1000 rays x 48
samples = 48k points, room0-scale grids, full-res 4/256 m TSDF prior):
  - full mapping iteration (sample + render + loss + backward + Adam)
  - forward-only loss
  - forward+backward (no Adam)
  - Adam update alone
  - trilinear gather forward, per grid
  - trilinear gather backward (the scatter-add transpose), per grid
  - TSDF volume trilinear sample (196M-voxel volume)
  - decoder MLP chain forward at 48k points
Run: python scripts/profile_mapping.py [--json OUT.json]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None,
                    help="substring filter: only run rows whose name "
                    "contains this (e.g. full_iter)")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from attentive_dfprior_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from attentive_dfprior_tpu.camera import Camera
    from attentive_dfprior_tpu.models.decoders import (
        mlp_decoder_forward,
        sample_tsdf,
    )
    from attentive_dfprior_tpu.models.scene import SceneConfig, init_scene
    from attentive_dfprior_tpu.ops.adam import adam_init, adam_update
    from attentive_dfprior_tpu.ops.grid_sample import (
        normalize_3d_coordinate,
        trilinear_sample,
    )
    from attentive_dfprior_tpu.render.renderer import RenderConfig
    from attentive_dfprior_tpu.slam.mapper import (
        StageLRs,
        build_lr_tree,
        mapping_loss_fn,
        mapping_stage,
    )

    bound = np.array([[-2.9, 8.94], [-3.2, 5.76], [-3.5, 3.54]])
    scfg = SceneConfig(
        bound=bound, c_dim=32, low_grid_len=0.32, high_grid_len=0.16,
        color_grid_len=0.16, fix_high=False, fix_color=False,
    )
    key = jax.random.PRNGKey(0)
    params = init_scene(key, scfg)
    voxel = 4.0 / 256
    dims = tuple(int(np.ceil((bound[i, 1] - bound[i, 0]) / voxel)) for i in range(3))
    tsdf = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=dims).astype(np.float32)
    )
    tsdf_bnds = jnp.asarray(bound, jnp.float32)
    jbound = jnp.asarray(bound, jnp.float32)
    cam = Camera(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    rcfg = RenderConfig(N_samples=32, N_surface=16)
    rng = np.random.default_rng(1)
    F = 5
    frames_color = jnp.asarray(rng.uniform(0, 1, (F, cam.H, cam.W, 3)), jnp.float32)
    frames_depth = jnp.asarray(rng.uniform(0.5, 4.0, (F, cam.H, cam.W)), jnp.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [2.0, 1.0, 0.0]
    frames_c2w = jnp.asarray(np.tile(c2w, (F, 1, 1)))
    lrs = StageLRs(5e-3, 5e-3, 5e-3, 5e-3, 5e-3)

    # force truthful relay mode BEFORE any timing
    float(jnp.zeros(()))

    R = 1000
    S = rcfg.N_samples + rcfg.N_surface
    N = R * S
    ro = jnp.asarray(rng.uniform(-1, 1, (R, 3)), jnp.float32)
    rd_ = rng.uniform(-1, 1, (R, 3))
    rd = jnp.asarray(rd_ / np.linalg.norm(rd_, axis=1, keepdims=True), jnp.float32)
    gd = jnp.asarray(rng.uniform(0.5, 4.0, (R,)), jnp.float32)
    gc = jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32)
    inside = jnp.ones((R,), bool)
    pts_np = np.asarray(ro)[:, None, :] + np.asarray(rd)[:, None, :] * np.linspace(
        0.5, 4.0, S
    )[None, :, None]
    pts = jnp.asarray(pts_np.reshape(-1, 3), jnp.float32)
    pn = normalize_3d_coordinate(pts, jbound)

    def slope_time(name, make_scan, call_args, lens=(8, 32)):
        """Marginal per-iteration seconds via two scan lengths.

        make_scan(n) must return a function of explicit array args (no big
        closures); call_args are passed at every invocation.
        """
        if args_cli.only and args_cli.only not in name:
            return None
        outs = {}
        for n in lens:
            fn = jax.jit(make_scan(n))
            o = fn(*call_args)
            jax.block_until_ready(o)  # compile + first run
            ts = []
            for _ in range(args_cli.reps):
                t0 = time.time()
                jax.block_until_ready(fn(*call_args))
                ts.append(time.time() - t0)
            outs[n] = float(np.median(ts))
        n0, n1 = lens
        per_iter = (outs[n1] - outs[n0]) / (n1 - n0)
        print(f"[{name}] {per_iter * 1e3:10.3f} ms/iter  "
              f"(raw: {', '.join(f'{n}it={outs[n]:.3f}s' for n in lens)})",
              flush=True)
        return per_iter

    results = {}

    # ---- full mapping iteration (the production scan body) ----
    def make_full(n):
        def run(params, frames_color, frames_depth, frames_c2w, tsdf):
            astate = adam_init(params)
            keys = jax.random.split(jax.random.PRNGKey(1), n)
            wf = jnp.zeros((n,), jnp.float32)
            p2, a2, losses = mapping_stage.__wrapped__(
                params, astate, frames_color, frames_depth, frames_c2w,
                None, tsdf, tsdf_bnds, jbound, keys, wf, lrs, "color",
                200, cam, rcfg, (False, False), 0.2, False, None,
            )
            return losses

        return run

    # The legacy plain-(X,Y,Z)-volume full iteration reproducibly faults
    # the chip when its graph contains the Pallas halo-fold VJP (isolated
    # 2026-08-21: rows-volume graphs + the same kernel are stable, incl.
    # under 8 GB HBM ballast; minimal big-temp+kernel repros do NOT fault —
    # an XLA/Mosaic interaction specific to this graph). The row is a
    # LAYOUT comparison, so pin it to the pure-XLA bitfold VJP explicitly.
    import os as _os

    _prev_vjp = _os.environ.get("DFPRIOR_TRILINEAR_VJP")
    _os.environ["DFPRIOR_TRILINEAR_VJP"] = "bitfold"
    try:
        results["full_iter_color"] = slope_time(
            "full_iter_color", make_full,
            (params, frames_color, frames_depth, frames_c2w, tsdf),
        )
    finally:
        if _prev_vjp is None:
            _os.environ.pop("DFPRIOR_TRILINEAR_VJP", None)
        else:
            _os.environ["DFPRIOR_TRILINEAR_VJP"] = _prev_vjp

    # ---- forward-only loss ----
    def make_fwd(n):
        def run(params, ro, rd, gd, gc, tsdf):
            def body(c, k):
                # iteration-dependent input: XLA must not hoist the body
                l = mapping_loss_fn(
                    params, ro + 1e-6 * k, rd, gd, gc, inside, tsdf,
                    tsdf_bnds, jbound, "color", rcfg, 0.2, jnp.float32(0.0),
                )
                return c + l, ()

            out, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.float32)
            )
            return out.reshape(1, 1) + jnp.zeros((8, 128))

        return run

    results["fwd_loss_color"] = slope_time(
        "fwd_loss_color", make_fwd, (params, ro, rd, gd, gc, tsdf)
    )

    # ---- forward+backward (no Adam) ----
    def make_fwdbwd(n):
        def run(params, ro, rd, gd, gc, tsdf):
            def body(acc, k):
                _, grads = jax.value_and_grad(mapping_loss_fn)(
                    params, ro + 1e-6 * k, rd, gd, gc, inside, tsdf,
                    tsdf_bnds, jbound, "color", rcfg, 0.2, jnp.float32(0.0),
                )
                return jax.tree_util.tree_map(jnp.add, acc, grads), ()

            z = jax.tree_util.tree_map(jnp.zeros_like, params)
            out, _ = jax.lax.scan(body, z, jnp.arange(n, dtype=jnp.float32))
            return out

        return run

    results["fwd_bwd_color"] = slope_time(
        "fwd_bwd_color", make_fwdbwd, (params, ro, rd, gd, gc, tsdf)
    )

    # ---- Adam update alone ----
    lr_tree = build_lr_tree(params, lrs, scfg)

    def make_adam(n):
        def run(params):
            def body(carry, _):
                p, a = carry
                g = jax.tree_util.tree_map(lambda x: x * 1e-8, p)
                p, a = adam_update(p, g, a, lr_tree)
                return (p, a), ()

            astate = adam_init(params)
            (p, a), _ = jax.lax.scan(body, (params, astate), jnp.arange(n))
            return p

        return run

    results["adam_update"] = slope_time("adam_update", make_adam, (params,))

    # ---- per-grid gather fwd / scatter bwd ----
    for gk in ("grid_low", "grid_high", "grid_color"):
        C = params[gk].shape[-1]

        def make_g(n):
            def run(grid, pn):
                def body(acc, k):
                    return acc + trilinear_sample(grid, pn + 1e-7 * k).sum(0), ()

                out, _ = jax.lax.scan(
                    body, jnp.zeros((C,)), jnp.arange(n, dtype=jnp.float32)
                )
                return out.sum().reshape(1, 1) + jnp.zeros((8, 128))

            return run

        results[f"gather_fwd_{gk}"] = slope_time(
            f"gather_fwd_{gk}", make_g, (params[gk], pn)
        )

        def make_s(sampler):
            def outer(n):
                def run(grid, pn, ct):
                    def body(acc, k):
                        pk = pn + 1e-7 * k
                        _, vjp = jax.vjp(lambda g: sampler(g, pk), grid)
                        (gg,) = vjp(ct)
                        return acc + gg, ()

                    out, _ = jax.lax.scan(
                        body, jnp.zeros_like(grid),
                        jnp.arange(n, dtype=jnp.float32),
                    )
                    return out

                return run

            return outer

        ct = jnp.ones((N, C), jnp.float32)
        from attentive_dfprior_tpu.ops.grid_sample import (
            trilinear_sample_cs,
            trilinear_sample_halo,
        )

        # production path (cell-scatter + Pallas halo-fold custom VJP)
        results[f"scatter_bwd_{gk}"] = slope_time(
            f"scatter_bwd_{gk}", make_s(trilinear_sample_halo),
            (params[gk], pn, ct),
        )
        # round-4 cell-scatter + XLA transpose+stencil, for comparison
        results[f"scatter_bwd_cs_{gk}"] = slope_time(
            f"scatter_bwd_cs_{gk}", make_s(trilinear_sample_cs),
            (params[gk], pn, ct),
        )
        # XLA autodiff transpose, for the comparison row
        results[f"scatter_bwd_xla_{gk}"] = slope_time(
            f"scatter_bwd_xla_{gk}", make_s(trilinear_sample),
            (params[gk], pn, ct),
        )

    # ---- fused high+color pair VJP (one doubled-width scatter+fold) ----
    from attentive_dfprior_tpu.ops.grid_sample import trilinear_sample_pair

    if params["grid_high"].shape == params["grid_color"].shape:
        Cp = params["grid_high"].shape[-1]
        ctp = jnp.ones((N, Cp), jnp.float32)

        def make_pair(n):
            def run(gh, gc, pn, ct):
                def body(acc, k):
                    pk = pn + 1e-7 * k
                    _, vjp = jax.vjp(
                        lambda a, b: trilinear_sample_pair(a, b, pk), gh, gc
                    )
                    ga, gb = vjp((ct, ct))
                    return (acc[0] + ga, acc[1] + gb), ()

                out, _ = jax.lax.scan(
                    body, (jnp.zeros_like(gh), jnp.zeros_like(gc)),
                    jnp.arange(n, dtype=jnp.float32),
                )
                return out

            return run

        results["scatter_bwd_pair_highcolor"] = slope_time(
            "scatter_bwd_pair_highcolor", make_pair,
            (params["grid_high"], params["grid_color"], pn, ctp),
        )

    # ---- cell-stencil VJP internals for the big (high) grid ----
    # decides the next kernel: is the remaining backward cost the scatter,
    # the corner-major transpose, or the stencil adds?
    from attentive_dfprior_tpu.ops.grid_sample import _cell_stencil_grid_grad

    gshape = params["grid_high"].shape
    nxg, nyg, nzg, Cg = gshape
    nvox = nxg * nyg * nzg
    ctg = jnp.ones((N, Cg), jnp.float32)

    def make_cellgrad(n):
        def run(pn, ctg):
            def body(acc, k):
                return acc + _cell_stencil_grid_grad(gshape, pn + 1e-7 * k, ctg), ()

            out, _ = jax.lax.scan(
                body, jnp.zeros(gshape), jnp.arange(n, dtype=jnp.float32)
            )
            return out

        return run

    results["cellgrad_total_high"] = slope_time(
        "cellgrad_total_high", make_cellgrad, (pn, ctg)
    )

    def make_cellscatter(n):
        def run(pn, ctg):
            def body(acc, k):
                pk = pn + 1e-7 * k
                dims3 = jnp.array(gshape[:3], dtype=pk.dtype)
                idxq = jnp.clip((pk + 1.0) * 0.5 * (dims3 - 1.0), 0.0, dims3 - 1.0)
                i0 = jnp.minimum(
                    jnp.floor(idxq).astype(jnp.int32),
                    jnp.array([nxg - 1, nyg - 1, nzg - 1], jnp.int32),
                )
                f = idxq - i0
                fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
                ws = []
                for wx in (1 - fx, fx):
                    for wy in (1 - fy, fy):
                        for wz in (1 - fz, fz):
                            ws.append(wx * wy * wz)
                w = jnp.stack(ws, axis=1)
                upd = (w[:, :, None] * ctg[:, None, :]).reshape(-1, 8 * Cg)
                cellid = (i0[:, 0] * nyg + i0[:, 1]) * nzg + i0[:, 2]
                return acc.at[cellid].add(upd), ()

            out, _ = jax.lax.scan(
                body, jnp.zeros((nvox, 8 * Cg)), jnp.arange(n, dtype=jnp.float32)
            )
            return out

        return run

    results["cellgrad_scatter_high"] = slope_time(
        "cellgrad_scatter_high", make_cellscatter, (pn, ctg)
    )

    def make_stencil(n):
        def run(cells):
            def body(acc, k):
                corner_major = jnp.transpose(
                    (cells + k).reshape(nvox, 8, Cg), (1, 0, 2)
                )
                out = jnp.zeros(gshape)
                ci = 0
                for dx in (0, 1):
                    for dy in (0, 1):
                        for dz in (0, 1):
                            y = corner_major[ci].reshape(nxg, nyg, nzg, Cg)
                            out = out + jnp.pad(
                                y[: nxg - dx, : nyg - dy, : nzg - dz],
                                ((dx, 0), (dy, 0), (dz, 0), (0, 0)),
                            )
                            ci += 1
                return acc + out, ()

            out, _ = jax.lax.scan(
                body, jnp.zeros(gshape), jnp.arange(n, dtype=jnp.float32)
            )
            return out

        return run

    cells0 = jnp.zeros((nvox, 8 * Cg))
    results["cellgrad_stencil_high"] = slope_time(
        "cellgrad_stencil_high", make_stencil, (cells0,)
    )

    def make_bitfold(n):
        from attentive_dfprior_tpu.ops.grid_sample import (
            _cell_bitfold_grid_grad,
        )

        def run(cells):
            def body(acc, k):
                return acc + _cell_bitfold_grid_grad(gshape, cells + k), ()

            out, _ = jax.lax.scan(
                body, jnp.zeros(gshape), jnp.arange(n, dtype=jnp.float32)
            )
            return out

        return run

    results["cellgrad_bitfold_high"] = slope_time(
        "cellgrad_bitfold_high", make_bitfold, (cells0,)
    )

    # ---- TSDF volume sample (196M voxels) ----
    def make_tsdf(n):
        def run(tsdf, pts):
            def body(acc, k):
                return acc + sample_tsdf(tsdf, pts + 1e-7 * k, tsdf_bnds).sum(), ()

            out, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.float32)
            )
            return out.reshape(1, 1) + jnp.zeros((8, 128))

        return run

    results["tsdf_sample"] = slope_time("tsdf_sample", make_tsdf, (tsdf, pts))

    # ---- TSDF sample, production wide-Z-row layout (TSDFRows) ----
    from attentive_dfprior_tpu.ops.grid_sample import tsdf_to_rows

    tsdf_rows = tsdf_to_rows(np.asarray(tsdf))
    results["tsdf_sample_rows"] = slope_time(
        "tsdf_sample_rows", make_tsdf, (tsdf_rows, pts)
    )

    # ---- full mapping iteration with the production rows layout ----
    results["full_iter_color_rows"] = slope_time(
        "full_iter_color_rows", make_full,
        (params, frames_color, frames_depth, frames_c2w, tsdf_rows),
    )

    # ---- decoder MLP chains forward ----
    c_feat = jnp.asarray(rng.uniform(-1, 1, (N, 32)), jnp.float32)

    def make_mlp(n):
        def run(low, pts, c_feat):
            def body(acc, k):
                return acc + mlp_decoder_forward(low, pts + 1e-6 * k, c_feat).sum(), ()

            out, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.float32)
            )
            return out.reshape(1, 1) + jnp.zeros((8, 128))

        return run

    # longer lens: at (8, 32) this op's marginal cost was below relay
    # timing noise and produced a nonsense negative row (VERDICT r03 weak #2)
    results["mlp_low_fwd"] = slope_time(
        "mlp_low_fwd", make_mlp, (params["low"], pts, c_feat), lens=(16, 128)
    )

    # ---- fwd+bwd split at the production (rows + cellstencil) config ----
    def make_fwdbwd_rows(n):
        def run(params, ro, rd, gd, gc, tsdf):
            def body(acc, k):
                _, grads = jax.value_and_grad(mapping_loss_fn)(
                    params, ro + 1e-6 * k, rd, gd, gc, inside, tsdf,
                    tsdf_bnds, jbound, "color", rcfg, 0.2, jnp.float32(0.0),
                )
                return jax.tree_util.tree_map(jnp.add, acc, grads), ()

            z = jax.tree_util.tree_map(jnp.zeros_like, params)
            out, _ = jax.lax.scan(body, z, jnp.arange(n, dtype=jnp.float32))
            return out

        return run

    results["fwd_loss_color_rows"] = slope_time(
        "fwd_loss_color_rows", make_fwd, (params, ro, rd, gd, gc, tsdf_rows)
    )
    results["fwd_bwd_color_rows"] = slope_time(
        "fwd_bwd_color_rows", make_fwdbwd_rows,
        (params, ro, rd, gd, gc, tsdf_rows),
    )

    results = {k: v for k, v in results.items() if v is not None}
    print()
    print(f"{'piece':<28} {'ms/iter':>10}")
    for k, v in results.items():
        print(f"{k:<28} {v * 1e3:>10.3f}")
    total_scatter = sum(
        v for k, v in results.items() if k.startswith("scatter_bwd_grid")
    )
    print(f"{'sum(scatter_bwd_grid_*)':<28} {total_scatter * 1e3:>10.3f}")
    if args_cli.json:
        with open(args_cli.json, "w") as f:
            json.dump({k: v * 1e3 for k, v in results.items()}, f, indent=1)


if __name__ == "__main__":
    main()

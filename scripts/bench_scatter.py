#!/usr/bin/env python
"""Diagnose XLA TPU scatter-add cost: rows vs duplicates vs grid size.

The grid-gradient scatter-add is the top cost of the mapping iteration
after the TSDF-rows fix (17.4 of 26.1 ms — PROFILE_r03.json). The
profile's one structural clue: the low grid (22.8k voxels) scatters in
3.4 ms while the high grid (182k voxels) takes 7.0 ms at IDENTICAL update
counts, so the cost is not purely update-row-serialized. This script
measures scatter-add time as a function of:

  - update row count M (48k..768k)
  - destination rows nrows (22.8k vs 182k voxels)
  - index distribution: heavy-dup (trilinear-like), random, unique-permuted
  - unique_indices declaration (True only where actually unique)
  - row width C (32) vs scalar-expanded

plus two candidate reformulations of the real 8-corner trilinear backward:
  - b0: jax.vjp of trilinear_sample (today's path: 8 gathers' transpose)
  - b1: one concatenated (8N, C) scatter-add
  - b2: per-corner consecutive-run merge (samples along a ray repeat
        corners) then one (8N, C) scatter-add of the merged stream

Run: python scripts/bench_scatter.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from attentive_dfprior_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from attentive_dfprior_tpu.ops.grid_sample import (
        _corner_indices_weights,
        normalize_3d_coordinate,
        trilinear_sample,
    )

    # force truthful relay mode before timing
    float(jnp.zeros(()))

    def slope_time(name, fn, args, lens=(8, 32), reps=3):
        outs = {}
        for n in lens:
            def scan_fn(*a, n=n):
                def body(acc, k):
                    return acc + fn(*a, k), ()

                out, _ = jax.lax.scan(
                    body, jnp.zeros_like(fn(*a, jnp.float32(0.0))),
                    jnp.arange(n, dtype=jnp.float32),
                )
                return out

            jf = jax.jit(scan_fn)
            jax.block_until_ready(jf(*args))
            ts = []
            for _ in range(reps):
                t0 = time.time()
                jax.block_until_ready(jf(*args))
                ts.append(time.time() - t0)
            outs[n] = float(np.median(ts))
        n0, n1 = lens
        per = (outs[n1] - outs[n0]) / (n1 - n0)
        print(f"[time] {name:<42} {per * 1e3:8.3f} ms/iter", flush=True)
        return per

    rng = np.random.default_rng(0)
    C = 32

    run_all = "--all" in sys.argv

    # ---- part 1: raw scatter-add scaling ----
    for nrows in ((22_800, 182_000) if run_all else ()):
        for M in (96_000, 384_000):
            vals = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32))
            idx_dup = jnp.asarray(
                np.sort(rng.integers(0, nrows, M)).astype(np.int32)
            )  # sorted heavy-dup (trilinear-like coherence)
            idx_rand = jnp.asarray(rng.integers(0, nrows, M).astype(np.int32))
            base = np.tile(np.arange(nrows, dtype=np.int32), M // nrows + 1)[:M]
            idx_uniqish = jnp.asarray(base)  # dup across tiles, unique inside

            def scat(idx):
                def f(vals, k):
                    buf = jnp.zeros((nrows, C), jnp.float32)
                    return buf.at[idx].add(vals + k)

                return f

            tag = f"nrows={nrows//1000}k M={M//1000}k"
            slope_time(f"scatter {tag} sorted-dup", scat(idx_dup), (vals,))
            slope_time(f"scatter {tag} random", scat(idx_rand), (vals,))
            if M <= nrows:
                uni = jnp.asarray(
                    rng.permutation(nrows)[:M].astype(np.int32)
                )

                def scat_u(vals, k):
                    buf = jnp.zeros((nrows, C), jnp.float32)
                    return buf.at[uni].add(vals + k, unique_indices=True)

                slope_time(f"scatter {tag} unique-decl", scat_u, (vals,))

    # ---- part 2: the real trilinear backward, three formulations ----
    bound = np.array([[-2.9, 8.94], [-3.2, 5.76], [-3.5, 3.54]])
    bnds = jnp.asarray(bound, jnp.float32)
    R, S = 1000, 48
    N = R * S
    ro = rng.uniform(bound[:, 0] + 1.0, bound[:, 1] - 1.0, (R, 3))
    rd = rng.normal(size=(R, 3))
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    z = np.linspace(0.05, 3.5, S)
    pts = (ro[:, None, :] + rd[:, None, :] * z[None, :, None]).reshape(-1, 3)
    pn = jnp.asarray(
        np.asarray(normalize_3d_coordinate(jnp.asarray(pts, jnp.float32), bnds))
    )
    ct = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))

    for gname, gl in (("high", 0.16),):
        dims = tuple(
            max(2, int(np.round((bound[i, 1] - bound[i, 0]) / gl))) for i in range(3)
        )
        grid = jnp.asarray(
            rng.standard_normal(dims + (C,)).astype(np.float32)
        )
        nx, ny, nz = dims
        nvox = nx * ny * nz
        print(f"--- grid {gname}: {dims} = {nvox} voxels ---", flush=True)

        def b0(grid, pn, ct, k):
            _, vjp = jax.vjp(lambda g: trilinear_sample(g, pn + 1e-9 * k), grid)
            (gg,) = vjp(ct)
            return gg

        def corners(pn, k):
            ids, w = _corner_indices_weights(grid.shape, pn + 1e-9 * k)
            return ids, w  # (N, 8) each

        def b1(grid, pn, ct, k):
            ids, w = corners(pn, k)
            vals = (w[..., None] * ct[:, None, :]).reshape(-1, C)  # (8N, C)
            buf = jnp.zeros((nvox, C), jnp.float32)
            return buf.at[ids.reshape(-1)].add(vals).reshape(grid.shape)

        def b2(grid, pn, ct, k):
            ids, w = corners(pn, k)  # (N, 8)
            vals = w[..., None] * ct[:, None, :]  # (N, 8, C)
            # consecutive-run merge per corner stream: samples along a ray
            # land in the same cell repeatedly, so ids[:, c] has runs.
            # Segmented Hillis-Steele inclusive scan along N (log2(N) steps,
            # static shifts — no associative_scan op), then scatter only
            # run-end rows; non-end rows go to a dummy row with zero value.
            ids_t = ids.T  # (8, N)
            vals_t = jnp.transpose(vals, (1, 0, 2))  # (8, N, C)
            same = jnp.concatenate(
                [jnp.zeros((8, 1), bool), ids_t[:, 1:] == ids_t[:, :-1]], axis=1
            )
            acc = vals_t
            seg = same
            d = 1
            while d < N:
                shifted = jnp.concatenate(
                    [jnp.zeros((8, d, C), acc.dtype), acc[:, :-d]], axis=1
                )
                acc = acc + jnp.where(seg[..., None], shifted, 0.0)
                seg_shift = jnp.concatenate(
                    [jnp.zeros((8, d), bool), seg[:, :-d]], axis=1
                )
                seg = seg & seg_shift
                d *= 2
            is_end = jnp.concatenate(
                [ids_t[:, 1:] != ids_t[:, :-1], jnp.ones((8, 1), bool)], axis=1
            )
            out_vals = jnp.where(is_end[..., None], acc, 0.0).reshape(-1, C)
            out_ids = jnp.where(is_end, ids_t, nvox).reshape(-1)
            buf = jnp.zeros((nvox + 1, C), jnp.float32)
            return buf.at[out_ids].add(out_vals)[:-1].reshape(grid.shape)

        def b3(grid, pn, ct, k):
            """Cell-scatter + dense stencil: ONE (N, 8C) row per point into
            a cell buffer, then 8 shifted adds to form the voxel gradient.

            Exactness at borders: when i0 is clamped to n-1, the fractional
            part f is 0, so every i1-corner weight carries a factor 0 — the
            stencil's out-of-range spill is zero-valued and plain shift-adds
            (zero-padded) reproduce the collapsed-corner semantics exactly.
            """
            pq = pn + 1e-9 * k
            dims_f = jnp.array([nx, ny, nz], dtype=pq.dtype)
            idx = (pq + 1.0) * 0.5 * (dims_f - 1.0)
            idx = jnp.clip(idx, 0.0, dims_f - 1.0)
            i0 = jnp.floor(idx).astype(jnp.int32)
            i0 = jnp.minimum(
                i0, jnp.array([nx - 1, ny - 1, nz - 1], jnp.int32)
            )
            f = idx - i0.astype(idx.dtype)
            fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
            # corner weights in the same (x, y, z-fastest) order as
            # _corner_indices_weights
            ws = []
            for wx_ in (1 - fx, fx):
                for wy_ in (1 - fy, fy):
                    for wz_ in (1 - fz, fz):
                        ws.append(wx_ * wy_ * wz_)
            w = jnp.stack(ws, axis=1)  # (N, 8)
            upd = (w[:, :, None] * ct[:, None, :]).reshape(N, 8 * C)
            cell = (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]
            buf = jnp.zeros((nvox, 8 * C), jnp.float32)
            cells = buf.at[cell].add(upd).reshape(nx, ny, nz, 8, C)
            grad = jnp.zeros((nx, ny, nz, C), jnp.float32)
            ci = 0
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        contrib = cells[
                            : nx - dx, : ny - dy, : nz - dz, ci, :
                        ]
                        grad = grad.at[dx:, dy:, dz:, :].add(contrib)
                        ci += 1
            return grad

        def b4(grid, pn, ct, k):
            """b3 with an MXU-friendly stencil: corner-block extraction as a
            (nvox, 8C) @ (8C, C) matmul per corner (the MXU does the strided
            relayout), shifts as zero-pads, one fused tree-add."""
            pq = pn + 1e-9 * k
            dims_f = jnp.array([nx, ny, nz], dtype=pq.dtype)
            idx = (pq + 1.0) * 0.5 * (dims_f - 1.0)
            idx = jnp.clip(idx, 0.0, dims_f - 1.0)
            i0 = jnp.floor(idx).astype(jnp.int32)
            i0 = jnp.minimum(
                i0, jnp.array([nx - 1, ny - 1, nz - 1], jnp.int32)
            )
            f = idx - i0.astype(idx.dtype)
            fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
            ws = []
            for wx_ in (1 - fx, fx):
                for wy_ in (1 - fy, fy):
                    for wz_ in (1 - fz, fz):
                        ws.append(wx_ * wy_ * wz_)
            w = jnp.stack(ws, axis=1)  # (N, 8)
            upd = (w[:, :, None] * ct[:, None, :]).reshape(N, 8 * C)
            cell = (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]
            buf = jnp.zeros((nvox, 8 * C), jnp.float32)
            cells = buf.at[cell].add(upd)  # (nvox, 8C)
            # selector matmuls: E[ci] is (8C, C) one-hot picking corner ci
            eye = jnp.eye(C, dtype=jnp.float32)
            parts = []
            ci = 0
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        sel = jnp.zeros((8 * C, C), jnp.float32)
                        sel = sel.at[ci * C:(ci + 1) * C, :].set(eye)
                        y = jax.lax.dot(
                            cells, sel,
                            precision=jax.lax.Precision.HIGHEST,
                        ).reshape(nx, ny, nz, C)
                        parts.append(
                            jnp.pad(
                                y[: nx - dx, : ny - dy, : nz - dz],
                                ((dx, 0), (dy, 0), (dz, 0), (0, 0)),
                            )
                        )
                        ci += 1
            out = parts[0]
            for pslice in parts[1:]:
                out = out + pslice
            return out

        def b5(grid, pn, ct, k):
            """b3 with ONE corner-major relayout: (nvox, 8, C) ->
            (8, nvox, C) transpose, then contiguous per-corner slices and
            pad-shift adds (no strided gathers, no matmul rounding)."""
            pq = pn + 1e-9 * k
            dims_f = jnp.array([nx, ny, nz], dtype=pq.dtype)
            idx = (pq + 1.0) * 0.5 * (dims_f - 1.0)
            idx = jnp.clip(idx, 0.0, dims_f - 1.0)
            i0 = jnp.floor(idx).astype(jnp.int32)
            i0 = jnp.minimum(
                i0, jnp.array([nx - 1, ny - 1, nz - 1], jnp.int32)
            )
            f = idx - i0.astype(idx.dtype)
            fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
            ws = []
            for wx_ in (1 - fx, fx):
                for wy_ in (1 - fy, fy):
                    for wz_ in (1 - fz, fz):
                        ws.append(wx_ * wy_ * wz_)
            w = jnp.stack(ws, axis=1)  # (N, 8)
            upd = (w[:, :, None] * ct[:, None, :]).reshape(N, 8 * C)
            cell = (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]
            buf = jnp.zeros((nvox, 8 * C), jnp.float32)
            cells = buf.at[cell].add(upd)
            corner_major = jnp.transpose(
                cells.reshape(nvox, 8, C), (1, 0, 2)
            )  # (8, nvox, C), one relayout
            parts = []
            ci = 0
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        y = corner_major[ci].reshape(nx, ny, nz, C)
                        parts.append(
                            jnp.pad(
                                y[: nx - dx, : ny - dy, : nz - dz],
                                ((dx, 0), (dy, 0), (dz, 0), (0, 0)),
                            )
                        )
                        ci += 1
            out = parts[0]
            for pslice in parts[1:]:
                out = out + pslice
            return out

        # scatter row-width scaling probe: same M, 8x wider rows
        vals_w = jnp.asarray(
            rng.standard_normal((N, 8 * C)).astype(np.float32)
        )
        idxp = jnp.asarray(rng.integers(0, nvox, N).astype(np.int32))

        def wide_scat(vals_w, k):
            buf = jnp.zeros((nvox, 8 * C), jnp.float32)
            return buf.at[idxp].add(vals_w + k)

        # correctness of b1/b2/b3 vs b0
        g0 = np.asarray(jax.jit(b0)(grid, pn, ct, jnp.float32(0.0)))
        for nm, fn in ((("b1", b1), ("b2", b2), ("b3", b3), ("b4", b4)) if run_all else (("b3", b3), ("b4", b4), ("b5", b5))):
            gi = np.asarray(jax.jit(fn)(grid, pn, ct, jnp.float32(0.0)))
            err = np.abs(gi - g0).max() / (np.abs(g0).max() + 1e-9)
            print(f"[parity] {nm} rel err {err:.2e}", flush=True)
            assert err < 1e-3, nm

        slope_time(f"b0 vjp(trilinear) {gname}", b0, (grid, pn, ct))
        if run_all:
            slope_time(f"b1 concat-8N scatter {gname}", b1, (grid, pn, ct))
            slope_time(f"b2 run-merge scatter {gname}", b2, (grid, pn, ct))
        slope_time(f"b3 cell-scatter+stencil {gname}", b3, (grid, pn, ct))
        slope_time(f"b4 cell-scatter+mxu-stencil {gname}", b4, (grid, pn, ct))
        slope_time(f"b5 cell-scatter+transpose {gname}", b5, (grid, pn, ct))
        slope_time(f"wide-row scatter M=48k w=8C {gname}", wide_scat, (vals_w,))


if __name__ == "__main__":
    main()

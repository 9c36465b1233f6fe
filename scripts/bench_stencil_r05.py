#!/usr/bin/env python
"""Round-5 grid-gradient stencil shootout on the real chip.

Times the cell-buffer -> grid-gradient conversion (the transpose+stencil
half of the trilinear VJP, 3.15 of high-grid's 4.42 ms in PROFILE_r04)
for: the production XLA transpose+stencil, the new XLA 3-stage bit-fold,
and the new Pallas halo-fold kernel at several block sizes. Same marginal
slope-time methodology as scripts/profile_mapping.py.

Run: python scripts/bench_stencil_r05.py [--json OUT.json]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from attentive_dfprior_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from attentive_dfprior_tpu.ops.grid_sample import (
        _cell_bitfold_grid_grad,
        _cell_scatter,
        _cell_stencil_grid_grad,
    )
    from attentive_dfprior_tpu.ops.pallas.halo_fold_kernel import cell_fold_halo

    float(jnp.zeros(()))  # force truthful sync relay mode

    # room0 high/color grid shape (the two big VJPs) + the low grid
    shapes = {
        "high": (74, 56, 44, 32),
        "low": (37, 28, 22, 32),
    }
    N = 48000
    rng = np.random.default_rng(1)
    results = {}

    def slope_time(name, make_scan, call_args, lens=(8, 32)):
        outs = {}
        for n in lens:
            fn = jax.jit(make_scan(n))
            o = fn(*call_args)
            jax.block_until_ready(o)
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                jax.block_until_ready(fn(*call_args))
                ts.append(time.time() - t0)
            outs[n] = float(np.median(ts))
        n0, n1 = lens
        per_iter = (outs[n1] - outs[n0]) / (n1 - n0)
        print(f"[{name}] {per_iter * 1e3:10.3f} ms/iter", flush=True)
        return per_iter * 1e3

    for gk, shape in shapes.items():
        nx, ny, nz, C = shape
        nvox = nx * ny * nz
        cells0 = jnp.asarray(
            rng.normal(size=(nvox, 8 * C)).astype(np.float32)
        )

        def make(fold_fn):
            def outer(n):
                def run(cells):
                    def body(acc, k):
                        return acc + fold_fn(cells + k), ()

                    out, _ = jax.lax.scan(
                        body,
                        jnp.zeros(shape),
                        jnp.arange(n, dtype=jnp.float32),
                    )
                    return out

                return run

            return outer

        # production baseline: transpose + 8-slab stencil (stencil part of
        # _cell_stencil_grid_grad, fed the precomputed cell buffer)
        def xla_transpose_stencil(cells, shape=shape, nvox=nvox, C=C):
            nx, ny, nz, _ = shape
            corner_major = jnp.transpose(cells.reshape(nvox, 8, C), (1, 0, 2))
            out = jnp.zeros(shape)
            ci = 0
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        y = corner_major[ci].reshape(nx, ny, nz, C)
                        out = out + jnp.pad(
                            y[: nx - dx, : ny - dy, : nz - dz],
                            ((dx, 0), (dy, 0), (dz, 0), (0, 0)),
                        )
                        ci += 1
            return out

        results[f"stencil_xla_transpose_{gk}"] = slope_time(
            f"stencil_xla_transpose_{gk}", make(xla_transpose_stencil),
            (cells0,),
        )
        results[f"stencil_xla_bitfold_{gk}"] = slope_time(
            f"stencil_xla_bitfold_{gk}",
            make(lambda c, s=shape: _cell_bitfold_grid_grad(s, c)),
            (cells0,),
        )
        for bx in (4, 8, 16):
            results[f"stencil_halo{bx}_{gk}"] = slope_time(
                f"stencil_halo{bx}_{gk}",
                make(lambda c, s=shape, b=bx: cell_fold_halo(c, s, bx=b)),
                (cells0,),
            )

        # end-to-end VJP (scatter + fold) comparison at reference workload
        pn = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

        def make_vjp(fold):
            def outer(n):
                def run(pn, ct):
                    def body(acc, k):
                        cells = _cell_scatter(shape, pn + 1e-7 * k, ct)
                        return acc + fold(cells), ()

                    out, _ = jax.lax.scan(
                        body,
                        jnp.zeros(shape),
                        jnp.arange(n, dtype=jnp.float32),
                    )
                    return out

                return run

            return outer

        results[f"vjp_cellstencil_{gk}"] = slope_time(
            f"vjp_cellstencil_{gk}",
            make_vjp(lambda c, s=shape: _cell_stencil_grid_grad(
                s, pn, ct) if False else xla_transpose_stencil(c)),
            (pn, ct),
        )
        results[f"vjp_bitfold_{gk}"] = slope_time(
            f"vjp_bitfold_{gk}",
            make_vjp(lambda c, s=shape: _cell_bitfold_grid_grad(s, c)),
            (pn, ct),
        )
        results[f"vjp_halo8_{gk}"] = slope_time(
            f"vjp_halo8_{gk}",
            make_vjp(lambda c, s=shape: cell_fold_halo(c, s, bx=8)),
            (pn, ct),
        )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

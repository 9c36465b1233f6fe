#!/usr/bin/env python
"""2-process jax.distributed smoke on CPU (VERDICT r2 'Next round' item 6).

The reference has no multi-node story at all (SURVEY §2.3); our run.py
carries a --multihost flag whose jax.distributed.initialize() had never
executed anywhere. This smoke runs it for real, twice over:

  phase 1  spawns TWO `run.py <cfg> --multihost --init_only` processes with
           a localhost coordinator (DFPRIOR_COORD env) — the literal
           production entry path, each reporting process i/2 and the
           2-device global view.
  phase 2  spawns two workers that build the global 2-device mesh (1 CPU
           device per process), shard a ray-loss vector over it, and
           psum across PROCESSES with shard_map — the exact collective
           shape of the per-host pose optimization (SURVEY §5: per-host
           ray shard, psum'd scalar). Asserts the reduced value.

Writes a JSON record (default MULTIHOST_SMOKE.json) so the execution is
checked in. Exit code 0 = both phases passed.

Run: python scripts/multihost_smoke.py [--out MULTIHOST_SMOKE.json]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker(proc_id: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=proc_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from functools import partial

    assert jax.process_count() == 2
    assert jax.device_count() == 2, jax.devices()
    mesh = Mesh(np.array(jax.devices()), ("dp",))

    # per-process ray-loss shard -> global (8,) array over both processes
    local = np.full((4,), float(proc_id + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local, global_shape=(8,)
    )

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P())
    def global_sum(x):
        # the tracker's cross-host scalar reduction (SURVEY §5)
        return jax.lax.psum(x.sum(), "dp")

    out = float(global_sum(garr))
    expected = 4.0 * 1 + 4.0 * 2
    assert out == expected, (out, expected)
    print(f"WORKER_OK {proc_id} psum={out} devices={jax.device_count()}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MULTIHOST_SMOKE.json")
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.port)
        return

    record = {"phases": {}, "ok": False}

    # ---- phase 1: the production run.py --multihost init path ----
    port = free_port()
    procs = []
    for i in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            DFPRIOR_COORD=f"127.0.0.1:{port}",
            DFPRIOR_NPROCS="2",
            DFPRIOR_PROC_ID=str(i),
            DFPRIOR_FORCE_CPU="1",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "run.py", "configs/Synthetic/room.yaml",
             "--multihost", "--init_only"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    ok1 = all(p.returncode == 0 for p in procs) and all(
        f"multihost: process {i}/2" in outs[i] for i in range(2)
    )
    record["phases"]["runpy_init"] = {
        "ok": ok1,
        "stdout": [
            [l for l in o.splitlines() if "multihost" in l] for o in outs
        ],
    }
    print(f"[phase1 run.py --multihost --init_only x2] ok={ok1}", flush=True)
    if not ok1:
        for o in outs:
            print(o[-1500:], file=sys.stderr)

    # ---- phase 2: cross-process psum over the global mesh ----
    port = free_port()
    procs = []
    for i in range(2):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--port", str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    ok2 = all(p.returncode == 0 for p in procs) and all(
        f"WORKER_OK {i} psum=12.0" in outs[i] for i in range(2)
    )
    record["phases"]["cross_process_psum"] = {
        "ok": ok2,
        "stdout": [
            [l for l in o.splitlines() if "WORKER_OK" in l] for o in outs
        ],
    }
    print(f"[phase2 2-process shard_map psum] ok={ok2}", flush=True)
    if not ok2:
        for o in outs:
            print(o[-1500:], file=sys.stderr)

    record["ok"] = ok1 and ok2
    record["when"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"multihost_smoke": record["ok"], "out": args.out}))
    sys.exit(0 if record["ok"] else 1)


if __name__ == "__main__":
    main()

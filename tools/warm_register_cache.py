#!/usr/bin/env python
"""Pre-warm the persistent compilation cache for `cwipc register`.

The registration flow's compiled-program set is finite — fused-ICP
variants x point-buffer capacity buckets x NN-grid buckets (plus normal
estimation and the analyzer searches) — but enumerating it by hand would
desync from the code, so this tool simply RUNS the register flow on
synthetic ground-truth scenes of the requested size buckets with the
persistent cache enabled (core/compile_cache.py).  Capacities are
pow-2-bucketed and grid dims ladder-bucketed (ops/knn.nn_grid_params), so
any later scene whose sizes land in the same buckets reuses every program
with zero compiles.

Typical use, once per machine (or per jax/libtpu upgrade):

    python tools/warm_register_cache.py                  # default ladder
    python tools/warm_register_cache.py --ncamera 3 --npoints 30000

Measured on the axon-relay v5e (round 5): a cold 3-camera/30k register
E2E is dominated by compiles; after this warm run the same register
completes with zero compile misses (see BASELINE.md "round 5").
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# `python tools/warm_register_cache.py` puts tools/ (not the repo root)
# on sys.path — the package import below needs the root
sys.path.insert(0, REPO)


def run_flow(ncamera: int, npoints: int, verbose: bool) -> float:
    """One synthetic ground-truth register flow; returns wall seconds."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    t0 = time.time()
    with tempfile.TemporaryDirectory(prefix="cwipc_warm_") as d:
        for args in (
            [
                "create_analysis_test", "--ncamera", str(ncamera),
                "--npoints", str(npoints), "--noise", "0.002",
                "--translation", "0.03", "--rotation", "0.06", "testpc.ply",
            ],
            ["register", "--nograb", "testpc.ply", "--nocoarse", "--nofloor"],
        ):
            rv = subprocess.run(
                [sys.executable, "-m", "cwipc_util_tpu", *args],
                cwd=d, env=env, text=True,
                capture_output=not verbose,
            )
            if rv.returncode != 0:
                out = (rv.stderr or "")[-2000:] if not verbose else ""
                raise SystemExit(
                    f"warm flow failed ({args[0]}, rc={rv.returncode})\n{out}"
                )
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ncamera", type=int, action="append",
                    help="camera counts to warm (repeatable; default: 3)")
    ap.add_argument("--npoints", type=int, action="append",
                    help="scene point counts to warm (repeatable; default: "
                         "30000 160000 — the 16k/32k and 64k/128k-capacity "
                         "bucket pairs registration scenes typically hit)")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()
    ncams = args.ncamera or [3]
    sizes = args.npoints or [30000, 160000]

    from cwipc_util_tpu.core.compile_cache import (
        default_cache_dir,
        enable_persistent_cache,
    )

    cache_dir = enable_persistent_cache() or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    n0 = len(os.listdir(cache_dir))
    print(f"warm: cache {cache_dir} ({n0} entries)")
    for nc in ncams:
        for np_ in sizes:
            dt = run_flow(nc, np_, args.verbose)
            n1 = len(os.listdir(cache_dir))
            print(
                f"warm: ncamera={nc} npoints={np_}: {dt:.0f}s, "
                f"cache {n0} -> {n1} entries"
            )
            n0 = n1
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Roofline probes for the exact-selection kernel (CEILING.md claim 3).

Makes the "~50% VPU peak, ALU-bound" characterization of
ops/pallas_cols_select.py driver-measurable instead of builder-asserted:

1. ``scan_rates()`` — Pallas micro-kernels with exactly the selection
   scan's structure (VMEM-resident [S, 128] block, T threshold-count
   passes) in four arithmetic forms:
     * ``i32``   — the real kernel's op: int32 compare + int32 sum;
     * ``i16``   — 16-bit compare+sum (the packed-2x hypothesis: f32
       bit-pattern counts are exact on the truncated high halves for
       non-negative floats, so coarse bisection steps COULD run here);
     * ``bf16``  — same in bf16 (the other packed form);
     * ``mxu``   — indicator build + ones-matmul count (the VERDICT r4
       suggestion: offload the per-step candidate count to the MXU);
     * ``add``   — pure int32 add accumulation: the VPU ceiling for this
       access pattern (one op/elem, nothing to skip).
   Rates are directly comparable element-step/s; whichever form wins is
   the measured answer to "can the scan go faster per element".

2. ``selection_roofline(planes)`` — the real kernel on the real bench
   planes: total ms (seeded bench config), per-step scan cost from
   differenced truncated-bisection probes, the work model's element
   count (occupancy-bounded slots x tier-sized candidate rows), achieved
   element rate vs the ``i32`` micro-kernel speed-of-light, and HBM
   bytes vs the measured copy bandwidth.

Used by benchmarks/ceiling.py (fields ``sel_*``); runnable standalone:
    python benchmarks/sel_roofline.py [--rates-only]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 1536  # candidate rows per block (~ the 77*20 mid-tier scan)
T = 64    # threshold passes per tile
NTILES = 64


def _in_map(i):
    return (0, i)


def _out_map(i):
    return (0, i)


def _scan_kernel(x_ref, o_ref, *, form: str, t_steps: int):
    if form == "mxu":
        ones = jnp.ones((8, x_ref.shape[0]), jnp.float32)

    def step(i, acc):
        if form == "i32":
            bits = x_ref[...]
            mid = i * 65537 + 12345
            cnt = jnp.sum((bits <= mid).astype(jnp.int32), axis=0, keepdims=True)
            return acc + cnt.astype(jnp.float32)
        if form == "i16":
            bits = x_ref[...]
            mid = (i * 17 + 11).astype(jnp.int16)
            cnt = jnp.sum(
                (bits <= mid).astype(jnp.int16), axis=0, keepdims=True,
                dtype=jnp.int16,
            )
            return acc + cnt.astype(jnp.float32)
        if form == "bf16":
            v = x_ref[...]
            mid = (i.astype(jnp.float32) * 0.001 + 0.5).astype(jnp.bfloat16)
            cnt = jnp.sum(
                (v <= mid).astype(jnp.bfloat16), axis=0, keepdims=True,
                dtype=jnp.bfloat16,
            )
            return acc + cnt.astype(jnp.float32)
        if form == "mxu":
            bits = x_ref[...]
            mid = i * 65537 + 12345
            ind = (bits <= mid).astype(jnp.float32)
            cnt8 = jax.lax.dot_general(
                ones, ind, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + cnt8[0:1, :]
        if form == "add":
            bits = x_ref[...]
            return acc + jnp.sum(bits, axis=0, keepdims=True).astype(jnp.float32) * (
                i.astype(jnp.float32) * 0.0 + 1.0
            )
        raise ValueError(form)

    acc = jax.lax.fori_loop(
        0, t_steps, step, jnp.zeros((1, 128), jnp.float32)
    )
    o_ref[...] = jnp.broadcast_to(acc, o_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("form", "interpret", "s", "t", "ntiles")
)
def _scan_program(x, *, form: str, interpret: bool = False,
                  s: int = S, t: int = T, ntiles: int = NTILES):
    return pl.pallas_call(
        functools.partial(_scan_kernel, form=form, t_steps=t),
        interpret=interpret,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((s, 128), _in_map)],
        out_specs=pl.BlockSpec((8, 128), _out_map),
        out_shape=jax.ShapeDtypeStruct((8, ntiles * 128), jnp.float32),
    )(x)


def _diff_time(make_run, k_loop=8, reps=3):
    """K-loop differencing on the host side: run k_loop dispatches back to
    back vs one trivial dispatch (relay fixed cost cancels)."""

    def timed(n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = make_run()
        np.asarray(r)
        return time.perf_counter() - t0

    timed(1)  # compile/warm
    t1 = min(timed(1) for _ in range(reps))
    tk = min(timed(k_loop) for _ in range(reps))
    return max((tk - t1) / (k_loop - 1), 1e-9) * 1e3


def scan_rates(interpret: bool = False, forms=("add", "i32", "i16", "bf16", "mxu"),
               s: int = S, t: int = T, ntiles: int = NTILES):
    """Element-step rates (1e9/s) per arithmetic form, plus raw ms."""
    rng = np.random.default_rng(0)
    bits32 = jnp.asarray(
        rng.integers(0, 1 << 30, (s, ntiles * 128), dtype=np.int32)
    )
    xs = {
        "i32": bits32,
        "add": bits32,
        "mxu": bits32,
        "i16": (bits32 >> 15).astype(jnp.int16),
        "bf16": jnp.asarray(
            rng.random((s, ntiles * 128), dtype=np.float32), jnp.bfloat16
        ),
    }
    out = {}
    elems = s * ntiles * 128 * t
    for form in forms:
        x = xs[form]
        ms = _diff_time(lambda: _scan_program(
            x, form=form, interpret=interpret, s=s, t=t, ntiles=ntiles
        ))
        out[f"scan_{form}_ms"] = round(ms, 3)
        out[f"scan_{form}_gelems_s"] = round(elems / ms / 1e6, 1)
    return out


# ---------------------------------------------------------------------------
# The real kernel's roofline on the real bench planes
# ---------------------------------------------------------------------------

GY, GZ, CAP, K_NN = 504, 152, 28, 30


def selection_work_model(xs_g):
    """Total per-step scanned elements over the bench planes, from the
    kernel's own dispatch quantities (occ_q slot bound x tier-sized
    candidate rows x 128 lanes per tile)."""
    from cwipc_util_tpu.ops.pallas_cols_select import (
        RING_COLS, SLOT_TIERS, TILE, slab_occupancy,
    )

    gyz = GY * GZ
    ntiles = -(-gyz // TILE)
    capp = -(-CAP // 8) * 8
    tiers = sorted({min(t, capp) for t in (*SLOT_TIERS, capp)})
    off = 4 * GZ + 4
    occ_cols = (np.asarray(xs_g)[off:off + gyz, :CAP] < 1e30).sum(axis=1)
    elems = 0
    slots = 0
    for t in range(ntiles):
        occ_b = slab_occupancy(xs_g, gz=GZ, cap=CAP, tile=t)
        tier = next(tc for tc in tiers if occ_b <= tc)
        occ_q = int(occ_cols[t * TILE:(t + 1) * TILE].max()) if t * TILE < gyz else 0
        occ_q = min(occ_q, CAP)
        elems += occ_q * RING_COLS * tier * 128
        slots += occ_q
    return {"per_step_elems": int(elems), "slot_iters": int(slots)}


def selection_roofline(planes, rates: dict):
    from cwipc_util_tpu.ops.pallas_cols_select import cols_select_pallas

    xs_g, ys_g, zs_g = planes
    cell = jnp.float32(2.0 / 1000 * 2.0)

    def run(**kw):
        def f():
            s, kth = cols_select_pallas(
                xs_g, ys_g, zs_g, k=K_NN, gy=GY, gz=GZ, cap=CAP, **kw
            )
            return s[0, 0] + kth[0, 1]

        return _diff_time(f, k_loop=6)

    out = {}
    out["sel_ms"] = round(run(cell=cell, seeded=True), 2)
    b8 = run(probe="bisect8")
    b16 = run(probe="bisect16")
    out["sel_step_ms"] = round((b16 - b8) / 8.0, 3)
    out["sel_build_ms"] = round(run(probe="build"), 2)

    model = selection_work_model(xs_g)
    out.update(model)
    # achieved element rate during one counting pass, vs the i32
    # micro-kernel running the same op dense in VMEM (speed-of-light for
    # this op on this unit)
    out["sel_step_gelems_s"] = round(
        model["per_step_elems"] / out["sel_step_ms"] / 1e6, 1
    )
    if "scan_i32_gelems_s" in rates:
        out["sel_vpu_frac_of_scan_sol"] = round(
            out["sel_step_gelems_s"] / rates["scan_i32_gelems_s"], 3
        )

    # HBM traffic: each plane slab read once + two [capp, gyz] outputs
    capp = -(-CAP // 8) * 8
    gyz = GY * GZ
    off = 4 * GZ + 4
    off_al = 128 * (-(-off // 128))
    sw = 128 * (-(-(128 + off_al + off) // 128)) + 128
    ntiles = -(-gyz // 128)
    lp = (ntiles - 1) * 128 + sw
    bytes_in = 3 * capp * lp * 4  # transposed padded planes, read per tile range
    bytes_out = 2 * capp * ntiles * 128 * 4
    out["sel_hbm_mb"] = round((bytes_in + bytes_out) / 1e6, 1)

    # measured HBM copy bandwidth as the roofline's bandwidth axis
    big = jnp.zeros((64, 1 << 20), jnp.float32)  # 256 MB

    @jax.jit
    def cp(x):
        return x + 1.0

    ms = _diff_time(lambda: cp(big), k_loop=4)
    bw = 2 * big.size * 4 / (ms / 1e3) / 1e9
    out["hbm_copy_gb_s"] = round(bw, 1)
    out["sel_hbm_bound_ms"] = round(
        (bytes_in + bytes_out) / (bw * 1e9) * 1e3, 2
    )
    return out


def main():
    rates_only = "--rates-only" in sys.argv
    interpret = "--interpret" in sys.argv
    kw = dict(s=64, t=4, ntiles=2) if interpret else {}
    out = scan_rates(interpret=interpret, **kw)
    if not rates_only:
        from probe_colsel import build_planes

        planes = build_planes()
        out.update(selection_roofline(planes, out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""On-TPU comparison: GELL modes vs round-1 hypersparse kernels.

Representative medium-dataset configs (the regime VERDICT item 1 targets).
Usage: python scripts/exp_gell_bench.py [config_idx ...]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from spgrid.core.timing import time_kernel_chained
from spgrid.core.metrics import error_metrics
from spgrid.gen.artificial import artificial_matrix_generation
from spgrid.ops.gell import DeviceGELL, gell_spmm
from spgrid.ops import dispatch

CONFIGS = [
    # (m, avg, std, bw, skew-ish std dist) — mirrors spread-sample rows
    dict(m=65535, avg=5, std=1.6667, bw=0.05, dist="normal"),
    dict(m=33825, avg=10, std=3.3333, bw=0.3, dist="gamma", skew=1000),
    dict(m=262143, avg=5, std=1.6667, bw=0.05, dist="normal"),
    dict(m=55553, avg=50, std=16.6667, bw=0.05, dist="normal"),
]


def gold_spmm(csr, x):
    """Sparse f64 host gold."""
    xs = x.astype(np.float64)
    rows = np.repeat(np.arange(csr.m), csr.degrees)
    prods = csr.values[:, None].astype(np.float64) * xs[csr.col_idx]
    out = np.zeros((csr.m, x.shape[1]), np.float64)
    np.add.at(out, rows, prods)
    return out


def main(argv):
    n = 512
    idxs = [int(a) for a in argv] or [0]
    for ci in idxs:
        cfg = CONFIGS[ci]
        m = cfg["m"]
        t0 = time.time()
        csr = artificial_matrix_generation(
            m, m, cfg["avg"], cfg["std"], cfg["dist"], seed=14,
            placement="random", bw=cfg["bw"])
        x = np.random.default_rng(0).standard_normal((m, n)) \
            .astype(np.float32)
        gold = gold_spmm(csr, x)
        xj = jnp.asarray(x)
        flops = 2.0 * csr.nnz * n
        sol = (2 * m * n * 4 + csr.nnz * 8) / 819e9
        print(f"--- cfg{ci}: m={m} nnz={csr.nnz} bw={cfg['bw']} "
              f"gen={time.time()-t0:.0f}s sol={sol*1e6:.0f}us", flush=True)

        kernels = [("gell:" + md, lambda md=md: (
            DeviceGELL.from_csr(csr, mode=md), gell_spmm))
            for md in ("split24", "split16", "bf16", "f32")]

        # r3 A/B: windowed-f32 combine engine (MXU 6-pass vs r2 VPU)
        def _mk_f32(engine):
            import spgrid.ops.gell as gell_mod

            def fn(a, xx):
                gell_mod.WIN_F32_COMBINE = engine
                return gell_spmm(a, xx)
            return DeviceGELL.from_csr(csr, mode="f32"), fn
        kernels += [(f"gell:f32-{e}", lambda e=e: _mk_f32(e))
                    for e in ("vpu", "mxu")]
        kernels += [(f, lambda f=f: (dispatch.build(csr, f),
                                     dispatch.spmm_fn(f)))
                    for f in ("wcoo_bands", "wcoo_pallas", "ell", "coo")]
        for name, mk in kernels:
            try:
                a, fn = mk()
                with jax.default_matmul_precision("highest"):
                    y = np.asarray(jax.jit(fn)(a, xj), np.float64)
                    em = error_metrics(gold, y, epsilon=1e-4)
                    r = time_kernel_chained(
                        lambda ops, xx: fn(ops[0], xx), xj, operands=(a,),
                        min_time_s=0.3, repeats=3)
                t = r.time_per_iter_s
                print(f"{name:14s} {t*1e6:9.1f}us {flops/t/1e9:8.1f} GF "
                      f"sol%={100*sol/t:5.1f} pass={em.passed} "
                      f"max_rel={em.max_rel_diff:.1e} mape={em.mape:.1e}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:14s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

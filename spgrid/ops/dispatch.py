"""Format selection: heuristic dispatch + measured autotune.

The reference studies exactly this question — which format/kernel wins for
which structural features (the whole synthetic-dataset methodology).  Here
the selection is a first-class API (BASELINE.json config 4: "Format
autotune: CSR/COO/BSR/sliced-ELL selection across skew/bandwidth grid").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spgrid.core.timing import time_kernel
from spgrid.features.structural import MatrixFeatures, matrix_features
from spgrid.formats.csr import CSRMatrix
from spgrid.ops import xla as xops
from spgrid.ops.layouts import (
    DeviceCOO, DeviceELL, DeviceBSR, DeviceSELL, DeviceCSC, DeviceLDU,
    DeviceCV,
)
from spgrid.ops.pallas.bsr_spmm import bsr_spmm
from spgrid.ops.pallas.bsr_spmm_cstat import DeviceBSRCol, bsr_spmm_cstat
from spgrid.ops.pallas.panel_spmm import DevicePanels, panel_spmm
from spgrid.ops.pallas.wcoo_spmm import DeviceWCOO, wcoo_spmm
from spgrid.ops.pallas.wcoo_spmm_aligned import DeviceWCOOBands, \
    wcoo_spmm_aligned
from spgrid.ops.pallas.wcoo_spmv import DeviceWCOOAligned, wcoo_spmv
from spgrid.ops.pallas.wrow_spmv import DeviceWROW, wrow_spmv
from spgrid.ops.pallas.wpack_spmv import DeviceWPACK, wpack_spmv
from spgrid.ops.gell import DeviceGELL, gell_spmm
from spgrid.ops.merge import DeviceMerge, merge_spmm
from spgrid.ops.scoo import DeviceSCOO, scoo_spmm
from spgrid.ops.pallas.dgell import DeviceDGELL, dgell_spmm
from spgrid.ops.rbh import DeviceRBH, rbh_spmm

FORMATS = ("dense", "bsr_pallas", "bsrc_pallas", "panel_pallas", "bsr",
           "ell", "sell", "coo", "csc", "ldu", "cv_bf16", "cv_int8",
           "cv_panel", "wcoo_pallas", "wcoo_bands", "wcoo_spmv",
           "wrow_spmv", "wpack_spmv", "gell", "gell16", "cv_gell", "merge",
           "scoo", "dgell", "rbh")


def select_format(f: MatrixFeatures, n: int = 512,
                  dense_limit_bytes: int = 1 << 31,
                  tolerance: float = 0.0) -> str:
    """Format selection for `auto` dispatch.

    SpMV (n=1) keeps the measured round-1 routing (fused vector kernels).
    SpMM routes through the analytic cost models (ops/costmodel.py):
    argmin of per-kernel time estimates built from measured v5e constants.
    Round-1's threshold heuristics missed regime crossovers that depend on
    more than one feature (small-m dense, large-m gather regimes); the
    cost model ranks them directly.

    tolerance: stated acceptable relative error; at >= costmodel.
    CV_TOLERANCE (~bf16 X representation) the value-compressed kernels
    join the candidate set (the reference's CV study trade, explicit).
    """
    if n == 1 and f.density < 0.05:
        # SpMV: fused vector kernels (measured: wrow wins 10-20% over the
        # aligned-slot kernel on every 100k benchmark config)
        return "wrow_spmv"
    from spgrid.ops.costmodel import select_format_cost
    return select_format_cost(f, n, tolerance=tolerance)


def build(csr: CSRMatrix, fmt: str, *, bm: Optional[int] = None,
          bk: int = 128):
    """Materialize the device operand for a format name.

    bm=None picks the per-format default: 128 for the Pallas BSR kernel
    (amortizes the per-block X-tile DMA across a full MXU-height output
    block — 8.9x measured over bm=8), 8 for the XLA einsum path (keeps the
    gathered (nb, bk, n) intermediate small)."""
    if fmt == "dense":
        return jnp.asarray(csr.to_dense())
    if fmt in ("bsr", "bsr_pallas"):
        if bm is None:
            bm = 128 if fmt == "bsr_pallas" else 8
        return DeviceBSR.from_csr(csr, bm=bm, bk=bk)
    if fmt == "bsrc_pallas":
        return DeviceBSRCol.from_csr(csr, bm=bm or 128, bk=bk)
    if fmt == "panel_pallas":
        return DevicePanels.from_csr(csr, bk=bk)
    if fmt == "ell":
        return DeviceELL.from_csr(csr)
    if fmt == "sell":
        return DeviceSELL.from_csr(csr)
    if fmt == "coo":
        return DeviceCOO.from_csr(csr)
    if fmt == "csc":
        return DeviceCSC.from_csr(csr)
    if fmt == "ldu":
        from spgrid.formats.ldu import csr_to_ldu
        return DeviceLDU.from_ldu(csr_to_ldu(csr))
    if fmt in ("cv_bf16", "cv_int8"):
        return DeviceCV.from_csr(csr, mode=fmt.split("_")[1])
    if fmt == "cv_panel":
        # CV substrate in the panel kernel: bf16 blocks halve the dominant
        # panel stream (measured 114 -> 100us at 4096^2/50%)
        import dataclasses as _dc
        p = DevicePanels.from_csr(csr, bk=bk)
        return _dc.replace(p, panels=p.panels.astype(jnp.bfloat16))
    if fmt == "wcoo_pallas":
        return DeviceWCOO.from_csr(csr)
    if fmt == "wcoo_bands":
        return DeviceWCOOBands.from_csr(csr)
    if fmt == "wcoo_spmv":
        return DeviceWCOOAligned.from_csr(csr)
    if fmt == "wrow_spmv":
        return DeviceWROW.from_csr(csr)
    if fmt == "wpack_spmv":
        return DeviceWPACK.from_csr(csr)
    if fmt == "gell":
        # exact f32; gathers through band windows when the structure is
        # column-local (the XLA gather runs ~4-5x faster from <64MB srcs)
        return DeviceGELL.from_csr(csr, mode="f32")
    if fmt == "gell16":
        return DeviceGELL.from_csr(csr, mode="split16")
    if fmt == "cv_gell":
        return DeviceGELL.from_csr(csr, mode="bf16")
    if fmt == "merge":
        return DeviceMerge.from_csr(csr)
    if fmt == "dgell":
        # per-nnz HBM->VMEM DMA gather: scattered structure, X in HBM
        # (ops/pallas/dgell.py; MKL-IE regime, spmm_kernel_mkl_ie.cpp:75-104)
        return DeviceDGELL.from_csr(csr)
    if fmt == "scoo":
        # column-windowed COO: every gather source stays under the ~64MB
        # rate cliff even when the structure is scattered (ops/scoo.py)
        return DeviceSCOO.from_csr(csr)
    if fmt == "rbh":
        # reorder-block hybrid: column-cluster reorder into MXU block
        # tiles + gather residual (ops/rbh.py; the MKL-IE structure-reuse
        # regime, spmm_kernel_mkl_ie.cpp:75-104)
        return DeviceRBH.from_csr(csr)
    raise ValueError(f"unknown format {fmt!r}")


def spmm_fn(fmt: str) -> Callable:
    return {
        "dense": xops.spmm_dense,
        "bsr_pallas": bsr_spmm,
        "bsrc_pallas": bsr_spmm_cstat,
        "panel_pallas": panel_spmm,
        "bsr": xops.spmm_bsr,
        "ell": xops.spmm_ell,
        "coo": xops.spmm_coo,
        "csc": xops.spmm_csc,
        "sell": xops.spmm_sell,
        "ldu": xops.spmm_ldu,
        "cv_bf16": xops.spmm_cv,
        "cv_int8": xops.spmm_cv,
        "cv_panel": panel_spmm,
        "wcoo_pallas": wcoo_spmm,
        "wcoo_bands": wcoo_spmm_aligned,
        "wcoo_spmv": _wcoo_spmv_2d,
        "wrow_spmv": _wrow_spmv_2d,
        "wpack_spmv": _wpack_spmv_2d,
        "gell": gell_spmm,
        "gell16": gell_spmm,
        "cv_gell": gell_spmm,
        "merge": merge_spmm,
        "scoo": scoo_spmm,
        "dgell": dgell_spmm,
        "rbh": rbh_spmm,
    }[fmt]


def _wcoo_spmv_2d(a, x):
    """Bench adapter: the fused SpMV kernel on a (k, 1) dense operand."""
    y = wcoo_spmv(a, x[:, 0] if x.ndim == 2 else x)
    return y[:, None] if x.ndim == 2 else y


def _wpack_spmv_2d(a, x):
    """Bench adapter: multi-row packed SpMV on a (k, 1) dense operand.

    SpMV-only — a wider operand would silently drop columns."""
    if x.ndim == 2 and x.shape[1] != 1:
        raise ValueError("wpack_spmv is an SpMV kernel (n must be 1); "
                         f"got n={x.shape[1]}")
    y = wpack_spmv(a, x[:, 0] if x.ndim == 2 else x)
    return y[:, None] if x.ndim == 2 else y


def _wrow_spmv_2d(a, x):
    """Bench adapter: the WROW SpMV kernel on a (k, 1) dense operand.

    SpMV-only — a wider operand would silently drop columns."""
    if x.ndim == 2 and x.shape[1] != 1:
        raise ValueError("wrow_spmv is an SpMV kernel (n must be 1); "
                         f"got n={x.shape[1]}")
    y = wrow_spmv(a, x[:, 0] if x.ndim == 2 else x)
    return y[:, None] if x.ndim == 2 else y


@dataclasses.dataclass
class AutotuneResult:
    best: str
    times: Dict[str, float]     # seconds per iteration (inf = failed/skipped)


def autotune_spmm(
    csr: CSRMatrix,
    x: jax.Array,
    candidates=None,
    *,
    warmup_iters: int = 3,
    min_time_s: float = 0.05,
    min_iters: int = 5,
    dense_limit: int = 1 << 26,
) -> AutotuneResult:
    """Measure each candidate and return the fastest (ref methodology:
    empirical kernel x matrix sweeps; here condensed to a per-matrix tune —
    the inspector-executor discipline of mkl_sparse_optimize,
    spmm_kernel_mkl_ie.cpp:75-104).

    Candidates default to the cost model's AUTO_CANDIDATES (r4 admissions:
    gell/merge/sell included) so measured dispatch can pick every kernel
    cost-based dispatch can; inapplicable formats (cost model +inf — e.g.
    dense at 256GB, bsr with densifying blocks) are skipped, not timed."""
    from spgrid.ops.costmodel import AUTO_CANDIDATES, estimate_spmm_time
    if candidates is None:
        candidates = AUTO_CANDIDATES
    feats = matrix_features(csr)
    n_cols = x.shape[1] if x.ndim == 2 else 1
    times: Dict[str, float] = {}
    for fmt in candidates:
        if fmt == "dense" and csr.m * csr.k > dense_limit:
            times[fmt] = float("inf")
            continue
        if not np.isfinite(estimate_spmm_time(feats, fmt, n_cols)):
            times[fmt] = float("inf")
            continue
        try:
            a = build(csr, fmt)
            fn = spmm_fn(fmt)
            r = time_kernel(lambda: fn(a, x), warmup_iters=warmup_iters,
                            min_time_s=min_time_s, min_iters=min_iters)
            times[fmt] = r.time_per_iter_s
        except Exception:
            times[fmt] = float("inf")
    best = min(times, key=times.get)
    if times[best] == float("inf"):
        # every candidate failed/was skipped: returning one anyway would
        # make the caller build a format autotune refused to even measure
        raise RuntimeError(
            f"autotune: no runnable candidate among {list(times)}")
    return AutotuneResult(best=best, times=times)

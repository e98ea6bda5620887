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
from spgrid.ops.gell import DeviceGELL, gell_spmm

FORMATS = ("dense", "bsr_pallas", "bsrc_pallas", "panel_pallas", "bsr",
           "ell", "coo", "csc", "ldu", "cv_bf16", "cv_int8", "cv_panel",
           "wcoo_pallas", "wcoo_bands", "wcoo_spmv", "wrow_spmv",
           "gell", "gell16", "cv_gell")


def select_format(f: MatrixFeatures, n: int = 512,
                  dense_limit_bytes: int = 1 << 31) -> str:
    """Heuristic selection from structural features (no measurement).

    Regime boundaries measured on v5e (4096^2, n=512, f32; see commit log):
    - banded / column-clustered (low scaled bandwidth): DeviceBSR block
      skipping beats the dense matmul ~3.7x → 'bsr_pallas'.
    - dense enough that the MXU is cheap and the densified matrix fits →
      'dense' (the matmul's fixed cost beat every gather kernel down to
      ~5% density at this scale).
    - mid-density too big to densify → vertical panels ('panel_pallas'):
      dense-matmul throughput per panel, whole-panel skipping, R*bk-panel
      memory instead of m*k.
    - hypersparse: ELL when row lengths are even, lane-gather WCOO when
      skewed.
    """
    density = f.density
    dense_bytes = f.m * f.n * 4
    banded = f.avg_bw_scaled < 0.15
    if n == 1 and density < 0.05:
        # SpMV: fused vector kernels (measured: wrow wins 10-20% over the
        # aligned-slot kernel on every 100k benchmark config)
        return "wrow_spmv"
    # estimated occupancy of the (128,128) blocks a banded matrix produces:
    # a row's nnz land within its bandwidth, so blocks along the band hold
    # ~avg_nnz*128 of 128*(bw+128) slots
    block_occ = f.avg_nnz_per_row * 128 / (128 * (f.avg_bw + 128))
    if banded and density < 0.25 and block_occ >= 0.05:
        return "bsr_pallas"
    if density >= 0.05 and dense_bytes <= dense_limit_bytes:
        return "dense"
    # panels only pay off if a useful fraction of (2048,128) panels is
    # empty; for unstructured matrices every panel holds ~density*R*bk nnz
    # and DevicePanels would allocate the full dense footprint
    est_panel_occupancy = min(1.0, density * 2048 * 128)
    panel_bytes = est_panel_occupancy * dense_bytes
    if density >= 0.02 and panel_bytes <= dense_limit_bytes:
        return "panel_pallas"
    if banded:
        # hypersparse but column-clustered: aligned slot groups pack well
        return "wcoo_bands"
    if f.skew <= 2.0 and f.avg_nnz_per_row < 64:
        return "ell"
    return "wcoo_pallas"


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
    if fmt == "gell":
        return DeviceGELL.from_csr(csr, mode="split24")
    if fmt == "gell16":
        return DeviceGELL.from_csr(csr, mode="split16")
    if fmt == "cv_gell":
        return DeviceGELL.from_csr(csr, mode="bf16")
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
        "ldu": xops.spmm_ldu,
        "cv_bf16": xops.spmm_cv,
        "cv_int8": xops.spmm_cv,
        "cv_panel": panel_spmm,
        "wcoo_pallas": wcoo_spmm,
        "wcoo_bands": wcoo_spmm_aligned,
        "wcoo_spmv": _wcoo_spmv_2d,
        "wrow_spmv": _wrow_spmv_2d,
        "gell": gell_spmm,
        "gell16": gell_spmm,
        "cv_gell": gell_spmm,
    }[fmt]


def _wcoo_spmv_2d(a, x):
    """Bench adapter: the fused SpMV kernel on a (k, 1) dense operand."""
    y = wcoo_spmv(a, x[:, 0] if x.ndim == 2 else x)
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
    candidates=("dense", "bsr_pallas", "panel_pallas", "ell", "coo"),
    *,
    warmup_iters: int = 3,
    min_time_s: float = 0.05,
    min_iters: int = 5,
    dense_limit: int = 1 << 26,
) -> AutotuneResult:
    """Measure each candidate and return the fastest (ref methodology:
    empirical kernel x matrix sweeps; here condensed to a per-matrix tune)."""
    times: Dict[str, float] = {}
    for fmt in candidates:
        if fmt == "dense" and csr.m * csr.k > dense_limit:
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

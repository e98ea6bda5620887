"""Roofline model: per-chip speed-of-light given flop and byte counts.

The reference reports GFLOPS against per-device plot ceilings
(``results_visualization/master_plotter_synthetic.ipynb`` y_limit_dictionary)
and footprint-derived memory traffic (``spmv_kernel.h:24``).  Here the
roofline is first-class: every benchmark row carries achieved GFLOPS, the
memory-bound speed-of-light for its traffic, and the fraction attained
(BASELINE.json target: >=70% of memory-bandwidth roofline per chip).

FLOP models (BASELINE.md "Measurement protocol"):
  sparse op   = 2 * nnz * n   (n = dense-operand width; spmv_bench.cpp:404-408)
  GEMM bound  = 2 * m * k * n (spmv_bench.cpp:400-403)
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbytes_per_s: float       # HBM bandwidth
    peak_bf16_tflops: float       # MXU peak, bf16 inputs / f32 accum
    peak_f32_tflops: float        # MXU/VPU f32 peak
    vmem_mbytes: float = 128.0
    hbm_gbytes: float = 16.0


# Public spec-sheet numbers.
TPU_V5E = ChipSpec(
    name="tpu_v5e", hbm_gbytes_per_s=819.0, peak_bf16_tflops=197.0,
    peak_f32_tflops=98.5, vmem_mbytes=128.0, hbm_gbytes=16.0,
)
TPU_V5P = ChipSpec(
    name="tpu_v5p", hbm_gbytes_per_s=2765.0, peak_bf16_tflops=459.0,
    peak_f32_tflops=229.5, vmem_mbytes=128.0, hbm_gbytes=95.0,
)
TPU_V4 = ChipSpec(
    name="tpu_v4", hbm_gbytes_per_s=1228.0, peak_bf16_tflops=275.0,
    peak_f32_tflops=137.5, vmem_mbytes=128.0, hbm_gbytes=32.0,
)
CPU_HOST = ChipSpec(
    name="cpu_host", hbm_gbytes_per_s=50.0, peak_bf16_tflops=1.0,
    peak_f32_tflops=1.0, vmem_mbytes=32.0, hbm_gbytes=64.0,
)

_CHIPS = {c.name: c for c in (TPU_V5E, TPU_V5P, TPU_V4, CPU_HOST)}


def detect_chip() -> ChipSpec:
    """Best-effort detection of the local accelerator."""
    try:
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", "").lower()
    except Exception:
        kind = ""
    if "v5 lite" in kind or "v5e" in kind or "v5lite" in kind or "lite" in kind:
        return TPU_V5E
    if "v5p" in kind or "v5" in kind:
        return TPU_V5P
    if "v4" in kind:
        return TPU_V4
    return CPU_HOST


def roofline_time(
    flops: float,
    bytes_accessed: float,
    chip: ChipSpec,
    dtype: str = "float32",
) -> float:
    """Speed-of-light time (s): max of compute-bound and memory-bound time."""
    peak = chip.peak_bf16_tflops if dtype == "bfloat16" else chip.peak_f32_tflops
    t_compute = flops / (peak * 1e12) if flops else 0.0
    t_memory = bytes_accessed / (chip.hbm_gbytes_per_s * 1e9) if bytes_accessed else 0.0
    return max(t_compute, t_memory)


def roofline_fraction(
    achieved_time_s: float,
    flops: float,
    bytes_accessed: float,
    chip: ChipSpec,
    dtype: str = "float32",
) -> float:
    """Fraction of speed-of-light attained (1.0 = at the roofline)."""
    sol = roofline_time(flops, bytes_accessed, chip, dtype)
    if achieved_time_s <= 0:
        return 0.0
    return sol / achieved_time_s


def spmm_flops(nnz: int, n: int) -> float:
    """2*nnz*n — the reference flop model for all sparse ops, counted on the
    *original CSR nnz* regardless of format (spmv_bench.cpp:404-408)."""
    return 2.0 * nnz * max(n, 1)


def gemm_flops(m: int, k: int, n: int) -> float:
    return 2.0 * m * k * n


def csr_bytes(nnz: int, m: int, n: int, k_cols: int, val_bytes: int = 4,
              idx_bytes: int = 4) -> float:
    """Minimum HBM traffic for CSR SpMM: matrix footprint + dense in/out.

    Matrix footprint formula matches spmv_kernel.h:24:
    ``nnz*(val+idx) + (m+1)*idx``.  Dense traffic counts one streaming read
    of x(k,n) and one write of y(m,n); gathered re-reads push real traffic
    above this, making it a true speed-of-light bound.
    """
    mat = nnz * (val_bytes + idx_bytes) + (m + 1) * idx_bytes
    dense = (k_cols + m) * max(n, 1) * val_bytes if n else 0
    return float(mat + dense)

"""Single-run benchmark harness: build → warm-up → time → oracle → row.

The TPU re-design of the reference driver main/compute
(``spmv_code_bench/spmv_bench.cpp:270-557,564-1035``): load or generate a
matrix, convert to the benchmark format, run the warm-up + timed loop, check
accuracy against the float64 oracle, extract structural features, audit the
roofline, and emit one CSV row.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spgrid.core.config import BenchConfig
from spgrid.core.metrics import error_metrics, gold_spmm_fast
from spgrid.core.roofline import (
    ChipSpec, detect_chip, roofline_time, spmm_flops, gemm_flops, csr_bytes,
)
from spgrid.core.timing import time_kernel, time_kernel_chained
from spgrid.features.structural import matrix_features
from spgrid.formats.csr import CSRMatrix
from spgrid.gen.masks import create_mask
from spgrid.ops import dispatch
from spgrid.ops.attention import SparseAttention, attention_pipeline
from spgrid.bench.schema import BenchRow


def make_x(k: int, n: int, dtype: str, seed: int) -> np.ndarray:
    """Deterministic dense operand in [0.5, 1.5) — positive like the
    reference's fills, avoiding cancellation against the oracle."""
    rng = np.random.default_rng(seed ^ 0x5EED)
    x = rng.random((k, n)) + 0.5
    return x.astype(dtype)


def _cached_features(csr: CSRMatrix):
    """Structural features, computed once per matrix object (sweeps call
    run_spmm once per kernel on the same matrix)."""
    f = getattr(csr, "_spgrid_feats", None)
    if f is None:
        f = matrix_features(csr)
        csr._spgrid_feats = f
    return f


def _cached_value_features(csr: CSRMatrix):
    vf = getattr(csr, "_spgrid_value_feats", None)
    if vf is None:
        from spgrid.features.values import value_features
        vsample = (csr.values if csr.nnz <= 1 << 20
                   else csr.values[:: csr.nnz // (1 << 20) + 1])
        vf = value_features(np.asarray(vsample))
        csr._spgrid_value_feats = vf
    return vf


# Device-side dense-operand cache (one entry).  On this tunneled platform
# the X transfer is the dominant fixed cost of a row (~800MB at m=393k
# n=512 f32); sweeps run many kernels on the same matrix and the operand
# is deterministic in (k, n, dtype, seed), so pay the transfer (or the
# on-device generation) once.
_XD_CACHE: dict = {}


def _cached_xd(key, build) -> "jnp.ndarray":
    hit = _XD_CACHE.get(key)
    if hit is not None:
        return hit
    _XD_CACHE.clear()
    xd = build()
    _XD_CACHE[key] = xd
    return xd


def _cached_gold(csr: CSRMatrix, gold_csr: CSRMatrix, x_gold: np.ndarray,
                 gold_class: str, key_base) -> np.ndarray:
    """f64 oracle, cached on the matrix object per (n,dtype,seed,class).

    The oracle is identical for every exact kernel on the same matrix and
    operand; recomputing it per kernel row costs minutes of host time per
    row on this 1-CPU box.  CV/split modes gate against their dequantized
    gold, so the class is part of the key.  At most 2 entries are kept
    (exact + one CV class) to bound host memory (m*n float64 each)."""
    cache = getattr(csr, "_spgrid_gold_cache", None)
    if cache is None:
        cache = {}
        csr._spgrid_gold_cache = cache
    key = (*key_base, gold_class)
    gold = cache.get(key)
    if gold is None:
        gold = gold_spmm_fast(gold_csr.row_ptr, gold_csr.col_idx,
                              gold_csr.values, x_gold)
        if len(cache) >= 2:
            cache.pop(next(iter(cache)))
        cache[key] = gold
    return gold


def _cached_device_oracle(csr: CSRMatrix, gold_csr: CSRMatrix,
                          gold_class: str):
    """DeviceOracle per (matrix object, accuracy class) — the gold ELL
    upload and the dd gold compute are paid once per class, not per
    kernel row."""
    from spgrid.core.device_oracle import DeviceOracle
    cache = getattr(csr, "_spgrid_dev_oracle", None)
    if cache is None:
        cache = {}
        csr._spgrid_dev_oracle = cache
    orc = cache.get(gold_class)
    if orc is None:
        orc = DeviceOracle.from_csr(gold_csr)
        if len(cache) >= 2:
            cache.pop(next(iter(cache)))
        cache[gold_class] = orc
    return orc


def _xg_device(xd, fmt: str):
    """The accuracy class's X transform, on device — must match the host
    transforms in run_spmm's accuracy block bit-for-bit (both are RNE
    bf16 rounding / high-half masking)."""
    if fmt in ("cv_gell", "cv_panel"):
        return xd.astype(jnp.bfloat16).astype(jnp.float32)
    if fmt == "gell16":
        xf = xd.astype(jnp.float32)
        ui = jax.lax.bitcast_convert_type(xf, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(ui & jnp.uint32(0xFFFF0000),
                                          jnp.float32)
        lo = (xf - hi).astype(jnp.bfloat16).astype(jnp.float32)
        return hi + lo
    return xd


def _xg_host(x: np.ndarray, fmt: str) -> np.ndarray:
    """Host mirror of _xg_device (same RNE bf16 rounding / masking)."""
    import ml_dtypes
    xf = np.ascontiguousarray(x, np.float32)
    if fmt in ("cv_gell", "cv_panel"):
        return xf.astype(ml_dtypes.bfloat16).astype(np.float32)
    if fmt == "gell16":
        hi = (xf.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
        lo = (xf - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
        return hi + lo
    return xf


_XHOST_CACHE: dict = {}


def _cached_host_x(k: int, n: int, dtype: str, seed: int) -> np.ndarray:
    """Host copy of device_x's values (threefry on the CPU backend)."""
    key = (k, n, dtype, seed)
    hit = _XHOST_CACHE.get(key)
    if hit is None:
        from spgrid.core.device_oracle import host_x_of_device
        _XHOST_CACHE.clear()
        hit = host_x_of_device(k, n, dtype, seed)
        _XHOST_CACHE[key] = hit
    return hit


KERNELS = {
    # kernel name -> format name in ops.dispatch
    "csr_xla_coo": "coo",          # segment-sum baseline (naive CSR analogue)
    "ell_xla": "ell",              # padded-gather
    "bsr_xla": "bsr",              # batched block matmul via XLA
    "bsr_pallas": "bsr_pallas",    # Pallas MXU block kernel (row-stationary)
    "bsrc_pallas": "bsrc_pallas",  # C-stationary band-resident block kernel
    "panel_pallas": "panel_pallas",  # vertical-panel kernel (mid-density)
    "wcoo_bands": "wcoo_bands",    # aligned slot groups (banded hypersparse)
    "dense": "dense",              # densified matmul
    "wcoo_pallas": "wcoo_pallas",  # lane-gather windowed-COO Pallas kernel
    "wcoo_spmv": "wcoo_spmv",      # fused aligned-slot SpMV (n=1, banded)
    "wrow_spmv": "wrow_spmv",      # window-row packed SpMV (n=1, scattered)
    "wpack_spmv": "wpack_spmv",    # multi-row packed SpMV (n=1, gen-4)
    "csc": "csc",                  # column-major scatter (MKL CSC analogue)
    "ldu": "ldu",                  # face-list LDU (OpenFOAM; symmetric pattern)
    "cv_bf16": "cv_bf16",          # compressed-value bf16
    "cv_int8": "cv_int8",          # compressed-value int8 + row scales
    "cv_panel": "cv_panel",        # bf16 panel blocks (CV x panel kernel)
    "gell": "gell",                # gather-ELL, split24 X (f32-exact)
    "gell16": "gell16",            # gather-ELL, split16 X (~2^-17 on X)
    "cv_gell": "cv_gell",          # gather-ELL, bf16 X (CV-on-X mode)
    "merge": "merge",              # merge-path equal-nnz blocks (A.3)
    "scoo": "scoo",                # column-windowed COO (scattered hypersparse)
    "sell": "sell",                # SELL-C-sigma (sigma-sorted sliced ELL)
    "dgell": "dgell",              # DMA-gather ELL (scattered hypersparse)
    "rbh": "rbh",                  # reorder-block hybrid (MKL-IE regime)
    "gemm_bound": "dense",         # dense GEMM upper bound (dense flop count)
    "auto": None,                  # feature-driven dispatch (no measuring)
    "auto_tol": None,              # tolerance-enabled dispatch: cv_*
                                   # kernels join the candidate set (the
                                   # reference's value-compression trade,
                                   # lib/bitstream.c; gated vs dequantized
                                   # gold like any cv row)
    "autotune": None,              # measured dispatch (inspector-executor
                                   # discipline: inspect+optimize then run,
                                   # ref mkl_sparse_optimize usage)
}


def run_spmm(
    csr: CSRMatrix,
    kernel: str = "bsr_pallas",
    config: Optional[BenchConfig] = None,
    chip: Optional[ChipSpec] = None,
    check_accuracy: bool = True,
    x: Optional[np.ndarray] = None,
) -> BenchRow:
    config = config or BenchConfig()
    chip = chip or detect_chip()
    n = config.num_cols
    x_auto = x is None
    # Oracle placement: on device when the (m, n) result download would
    # dominate the row (tunneled accelerator, result > ~32MB); the host
    # f64 path below stays the definition and the default elsewhere.
    on_accel = jax.default_backend() != "cpu"
    use_dev_oracle = check_accuracy and config.dtype != "float64" and (
        config.oracle == "device"
        or (config.oracle == "auto" and on_accel
            and csr.m * n * np.dtype(config.dtype).itemsize > (32 << 20)))
    x_dev = x_auto and (
        config.x_source == "device"
        or (config.x_source == "auto" and use_dev_oracle))
    if x_dev:
        from spgrid.core.device_oracle import device_x
        xd = _cached_xd((csr.k, n, config.dtype, config.seed, "dev"),
                        lambda: device_x(csr.k, n, config.dtype,
                                         config.seed))
        # host values materialize lazily (heavy rows / host fallbacks)
    elif x_auto:
        x = make_x(csr.k, n, config.dtype, config.seed)
        xd = _cached_xd((csr.k, n, config.dtype, config.seed),
                        lambda: jnp.asarray(x))
    else:
        xd = jnp.asarray(x)
    if csr.values.dtype != np.dtype(config.dtype):
        src = csr
        cached = getattr(src, "_spgrid_cast_cache", None)
        if cached is not None and cached[0] == config.dtype:
            # reuse the previous cast object so its feature/gold caches
            # survive across the kernels of a sweep
            csr = cached[1]
        else:
            csr = src.astype(config.dtype)
            # structural features are value-independent and the value
            # features were sampled from the same (dtype-rounded) values:
            # carry the per-matrix caches through the dtype cast so sweeps
            # that run many kernels per matrix (e.g. the bf16 leg) don't
            # recompute per row
            for attr in ("_spgrid_feats", "_spgrid_value_feats"):
                if hasattr(src, attr):
                    setattr(csr, attr, getattr(src, attr))
            src._spgrid_cast_cache = (config.dtype, csr)

    with jax.default_matmul_precision(config.precision):
        fmt = KERNELS[kernel]
        if fmt is None:
            if kernel == "autotune":
                fmt = dispatch.autotune_spmm(csr, xd).best
            else:
                from spgrid.ops.costmodel import CV_TOLERANCE
                feats = _cached_features(csr)
                tol = CV_TOLERANCE if kernel == "auto_tol" else 0.0
                fmt = dispatch.select_format(feats, n, tolerance=tol)
            kernel_run = fmt
        else:
            kernel_run = kernel
        a = dispatch.build(csr, fmt)
        fn = dispatch.spmm_fn(fmt)

        flops = (gemm_flops(csr.m, csr.k, n) if kernel == "gemm_bound"
                 else spmm_flops(csr.nnz, n))
        vb = np.dtype(config.dtype).itemsize
        bytes_accessed = csr_bytes(csr.nnz, csr.m, n, csr.k, val_bytes=vb)
        if fmt == "dense":
            bytes_accessed = float((csr.m * csr.k + (csr.k + csr.m) * n) * vb)

        # Differenced chained-loop timing: loop fused in jit, full-output
        # feedback, RTT cancelled (see core.timing docstring).  The cost
        # model's estimate seeds the loop-length search so most rows need a
        # single probe length (each extra length costs a full warm+timed
        # pair on this high-RTT platform).
        try:
            from spgrid.ops.costmodel import estimate_spmm_time
            hint = estimate_spmm_time(_cached_features(csr), fmt, n)
            if not math.isfinite(hint):
                hint = None
        except Exception:  # noqa: BLE001
            hint = None
        timed = time_kernel_chained(
            fn, xd, operands=a,
            min_time_s=config.min_time_s,
            flops=flops,
            bytes_accessed=bytes_accessed,
            per_iter_hint=hint,
            static_lengths=config.timing_protocol == "static",
        )

        row = BenchRow(
            matrix_name=csr.name,
            kernel=kernel,
            fmt=fmt,
            dtype=config.dtype,
            device=chip.name,
            num_devices=1,
            input_columns=n,
            csr_m=csr.m,
            csr_k=csr.k,
            csr_nnz=csr.nnz,
            csr_mem_footprint_mb=csr.mem_footprint / (1 << 20),
            fmt_mem_footprint_mb=_fmt_footprint(a) / (1 << 20),
            time=timed.time_per_iter_s,
            iters=timed.iters,
            gflops=timed.gflops or math.nan,
            gbytes_per_s=timed.gbytes_per_s or math.nan,
            sol_time=roofline_time(flops, bytes_accessed, chip, config.dtype),
            roofline_frac=min(
                roofline_time(flops, bytes_accessed, chip, config.dtype)
                / timed.time_per_iter_s, 9.99),
        )

        feats = _cached_features(csr)
        row.density = feats.density
        row.avg_nnz_per_row = feats.avg_nnz_per_row
        row.std_nnz_per_row = feats.std_nnz_per_row
        row.avg_bw_scaled = feats.avg_bw_scaled
        row.std_bw_scaled = feats.std_bw_scaled
        row.avg_sc_scaled = feats.avg_sc_scaled
        row.skew = feats.skew
        row.avg_num_neighbours = feats.avg_num_neighbours
        row.cross_row_similarity = feats.cross_row_similarity
        # value features (ref csr_util_gen.c:1458-2004): compressibility
        # proxies that drive CV-mode selection; computed once per matrix
        # (the 1-D kmeans is host work — on this 1-CPU box a per-row
        # recompute inflates sweeps that run many kernels per matrix)
        vf = _cached_value_features(csr)
        row.val_unique_fraction = vf.unique_fraction
        row.val_exp_unique = float(vf.exp_unique)
        row.val_kmeans_rel_error_8 = vf.kmeans_rel_error_8

        if check_accuracy and use_dev_oracle:
            gold_class = (fmt if (fmt in ("cv_gell", "gell16")
                                  or fmt.startswith("cv_")) else "exact")
            eps = config.epsilon if config.dtype != "float32" else 1e-4
            gold_csr = csr
            if fmt.startswith("cv_") and fmt != "cv_gell":
                from spgrid.formats.cv import csr_to_cv, cv_to_csr
                mode = "bf16" if fmt == "cv_panel" else fmt.split("_")[1]
                gold_csr = cv_to_csr(csr_to_cv(csr, mode))
            orc = _cached_device_oracle(csr, gold_csr, gold_class)
            xg = _xg_device(xd, fmt)
            test_dev = fn(a, xd)
            xh = None
            if len(orc.heavy_rows):
                xh_base = (np.asarray(x, np.float32) if x is not None else
                           _cached_host_x(csr.k, n, config.dtype,
                                          config.seed))
                if x is None:
                    # threefry bits must agree across backends for the
                    # host f64 pass to gate the same operand; a tiny
                    # sample fetch guards the assumption at run time
                    samp = np.asarray(xd[:1, :min(8, n)], np.float32)
                    if not np.array_equal(samp, xh_base[:1, :min(8, n)]):
                        raise RuntimeError(
                            "device/host PRNG mismatch: device-x oracle "
                            "unusable on this backend")
                xh = np.asarray(_xg_host(xh_base, fmt), np.float32)
            m = orc.check(test_dev, xg, eps, x_host=xh)
            row.mae, row.max_ae, row.mse = m.mae, m.max_ae, m.mse
            row.mape, row.smape = m.mape, m.smape
            row.lnQ_error, row.mlare, row.gmare = (m.lnQ_error, m.mlare,
                                                   m.gmare)
            row.errors_passed = int(m.passed)
            if not m.passed:
                print(f"Test failed! {csr.name} {kernel_run}: "
                      f"max_rel_diff={m.max_rel_diff:.3e}")
        elif check_accuracy:
            if x is None:
                x = _cached_host_x(csr.k, n, config.dtype, config.seed)
            gold_csr = csr
            x_gold = x
            if fmt == "cv_gell" or (fmt == "gell16"):
                # gell's CV modes compress X, not A: gate kernel correctness
                # against the X representation the kernel actually gathers
                import ml_dtypes
                xf = np.ascontiguousarray(x, np.float32)
                if fmt == "cv_gell":
                    x_gold = xf.astype(ml_dtypes.bfloat16)                         .astype(np.float32)
                else:
                    hi = (xf.view(np.uint32)
                          & np.uint32(0xFFFF0000)).view(np.float32)
                    lo = (xf - hi).astype(ml_dtypes.bfloat16)                         .astype(np.float32)
                    x_gold = hi + lo
            elif fmt.startswith("cv_"):
                # Gate kernel correctness, not the intentional compression loss:
                # gold uses the dequantized values the kernel actually computes on.
                from spgrid.formats.cv import csr_to_cv, cv_to_csr
                mode = "bf16" if fmt == "cv_panel" else fmt.split("_")[1]
                gold_csr = cv_to_csr(csr_to_cv(csr, mode))
                if fmt == "cv_panel":
                    # the panel dot runs at DEFAULT precision (bf16 MXU
                    # pass), so x is effectively bf16 in the product too
                    import ml_dtypes
                    x_gold = np.ascontiguousarray(x, np.float32) \
                        .astype(ml_dtypes.bfloat16).astype(np.float32)
            gold_class = (fmt if (fmt in ("cv_gell", "gell16")
                                  or fmt.startswith("cv_")) else "exact")
            if x_auto:
                gold = _cached_gold(csr, gold_csr, x_gold, gold_class,
                                    (n, config.dtype, config.seed))
            else:
                gold = gold_spmm_fast(gold_csr.row_ptr, gold_csr.col_idx,
                                      gold_csr.values, x_gold)
            test = np.asarray(fn(a, xd))
            eps = config.epsilon if config.dtype != "float32" else 1e-4
            m = error_metrics(gold, test, epsilon=eps)
            row.mae, row.max_ae, row.mse = m.mae, m.max_ae, m.mse
            row.mape, row.smape = m.mape, m.smape
            row.lnQ_error, row.mlare, row.gmare = m.lnQ_error, m.mlare, m.gmare
            row.errors_passed = int(m.passed)
            if not m.passed:
                print(f"Test failed! {csr.name} {kernel_run}: "
                      f"max_rel_diff={m.max_rel_diff:.3e}")
    return row


def _fmt_footprint(a) -> int:
    leaves = jax.tree_util.tree_leaves(a)
    return sum(l.size * l.dtype.itemsize for l in leaves
               if hasattr(l, "dtype"))


def run_pipeline(
    wk: CSRMatrix, wq: CSRMatrix, wv: CSRMatrix,
    mask: Optional[CSRMatrix] = None,
    config: Optional[BenchConfig] = None,
    chip: Optional[ChipSpec] = None,
    use_pallas: bool = True,
    check_accuracy: bool = True,
) -> BenchRow:
    """Benchmark the 5-stage sparse-attention pipeline; per-stage GFLOPS
    columns mirror pipeline_code_bench/sddmm_bench.cpp:1010-1079."""
    from spgrid.ops.attention import make_pipeline_step, gold_pipeline

    config = config or BenchConfig()
    chip = chip or detect_chip()
    n = config.num_cols
    if mask is None:
        mask = create_mask(config.sparse_attention_type, wk.m,
                           config.sparsity, config.band_size, config.seed,
                           dtype=np.dtype(config.dtype))
    with jax.default_matmul_precision(config.precision):
        x = make_x(wk.k, n, config.dtype, config.seed)
        xd = jnp.asarray(x)
        attn = SparseAttention.from_csr(
            wk.astype(config.dtype), wq.astype(config.dtype),
            wv.astype(config.dtype), mask.astype(config.dtype))

        step = make_pipeline_step(attn, use_pallas=use_pallas)
        flops = attn.flops_per_col * n
        timed = time_kernel_chained(
            lambda at, xc: attention_pipeline(at, xc, use_pallas=use_pallas)[0],
            xd, operands=attn,
            min_time_s=config.min_time_s,
            flops=flops,
        )

        # Per-stage timing (separately jitted stage closures).
        stage_flops = {
            "K": spmm_flops(wk.nnz, n), "Q": spmm_flops(wq.nnz, n),
            "V": spmm_flops(wv.nnz, n), "S": spmm_flops(mask.nnz, n),
            "Y": spmm_flops(mask.nnz, n),
        }
        from spgrid.ops.pallas.bsr_spmm import bsr_spmm
        from spgrid.ops.pallas.sddmm import bsr_sddmm
        from spgrid.ops import xla as xops
        spmm = bsr_spmm if use_pallas else xops.spmm_bsr
        k_out = spmm(attn.wk, xd)
        q_out = spmm(attn.wq, xd)
        v_out = spmm(attn.wv, xd)
        from spgrid.ops.attention import _sddmm_bsr_xla as _sddmm_xla_fn
        if use_pallas:
            sddmm = lambda q: bsr_sddmm(attn.mask, q, k_out)  # noqa: E731
        else:
            sddmm = lambda q: _sddmm_xla_fn(attn.mask, q, k_out)  # noqa: E731

        def st(fn2, arg, ops):
            return time_kernel_chained(fn2, arg, operands=ops,
                                       min_time_s=0.2).time_per_iter_s

        stage_times = {
            "K": st(lambda w, xc: spmm(w, xc), xd, attn.wk),
            "Q": st(lambda w, xc: spmm(w, xc), xd, attn.wq),
            "V": st(lambda w, xc: spmm(w, xc), xd, attn.wv),
            "S": st(lambda ops, q: (bsr_sddmm(ops[0], q, ops[1]) if use_pallas
                                    else _sddmm_xla_fn(ops[0], q, ops[1])),
                    q_out, (attn.mask, k_out)),
        }
        from spgrid.ops.attention import _with_blocks
        s_bsr = _with_blocks(attn.mask, sddmm(q_out).astype(xd.dtype))
        stage_times["Y"] = st(lambda w, v: spmm(w, v), v_out, s_bsr)

        row = BenchRow(
            matrix_name=f"pipeline_{wk.name}",
            kernel="pipeline_pallas" if use_pallas else "pipeline_xla",
            fmt="bsr",
            dtype=config.dtype,
            device=chip.name,
            input_columns=n,
            csr_m=wk.m, csr_k=wk.k,
            csr_nnz=wk.nnz + wq.nnz + wv.nnz + mask.nnz,
            time=timed.time_per_iter_s,
            iters=timed.iters,
            gflops=timed.gflops or math.nan,
            gflops_spmm_K=stage_flops["K"] / stage_times["K"] / 1e9,
            gflops_spmm_Q=stage_flops["Q"] / stage_times["Q"] / 1e9,
            gflops_spmm_V=stage_flops["V"] / stage_times["V"] / 1e9,
            gflops_sddmm=stage_flops["S"] / stage_times["S"] / 1e9,
            gflops_final_spmm=stage_flops["Y"] / stage_times["Y"] / 1e9,
        )

        if check_accuracy:
            gold = gold_pipeline(wk, wq, wv, mask, x)
            test = np.asarray(step(xd))
            eps = 1e-3 if config.dtype == "float32" else config.epsilon
            mres = error_metrics(gold, test, epsilon=eps)
            row.mae, row.max_ae, row.mse = mres.mae, mres.max_ae, mres.mse
            row.mape, row.smape = mres.mape, mres.smape
            row.lnQ_error, row.mlare, row.gmare = (mres.lnQ_error, mres.mlare,
                                                   mres.gmare)
            row.errors_passed = int(mres.passed)
            if not mres.passed:
                print(f"Test failed! pipeline: max_rel_diff={mres.max_rel_diff:.3e}")
    return row


def run_sddmm(
    length: int,
    config: Optional[BenchConfig] = None,
    chip: Optional[ChipSpec] = None,
    use_pallas: bool = True,
    check_accuracy: bool = True,
    mask: Optional[CSRMatrix] = None,
    blocks: Optional[tuple] = None,
) -> BenchRow:
    """Standalone SDDMM benchmark (ref: sddmm_code_bench/sddmm_bench.cpp:
    578-1040): generate the attention mask, fill dense X and Z with 0.1
    (:924-930), time values = mask ⊙ (X @ Z^T), oracle-check in float64."""
    from spgrid.ops.layouts import DeviceBSR
    from spgrid.ops.pallas.sddmm import bsr_sddmm
    from spgrid.ops.xla import sddmm_coo
    from spgrid.ops.layouts import DeviceCOO

    config = config or BenchConfig()
    chip = chip or detect_chip()
    n = config.num_cols
    if mask is None:
        mask = create_mask(config.sparse_attention_type, length,
                           config.sparsity, config.band_size, config.seed,
                           dtype=np.dtype(config.dtype))
    with jax.default_matmul_precision(config.precision):
        dt = np.dtype(config.dtype)
        x = np.full((mask.m, n), 0.1, dtype=dt)
        z = np.full((mask.k, n), 0.1, dtype=dt)
        xd, zd = jnp.asarray(x), jnp.asarray(z)

        flops = spmm_flops(mask.nnz, n)
        vb = dt.itemsize
        bytes_accessed = float(mask.nnz * (vb + 4) + (mask.m + mask.k) * n * vb)
        if use_pallas:
            # occupancy-driven blocking (ops/sddmm_plan.py): bm=8 measured
            # 15x worse (grid-step floor), so candidates stay MXU-height;
            # the planner counts occupied blocks exactly and picks the
            # cheapest (bm, bk) under the measured v5e per-block model
            if blocks is not None:
                # forced blocking (planner-validation A/B: VERDICT r3
                # item 4 — measure fixed 128x128 against the plan before
                # trusting the model's est_speedup_vs_128)
                bm, bk = blocks
            else:
                from spgrid.ops.sddmm_plan import choose_sddmm_blocks
                plan = choose_sddmm_blocks(mask, n)
                bm, bk = plan.bm, plan.bk
            dev = DeviceBSR.from_csr(mask, bm=bm, bk=bk)
            fn = lambda ops, q: bsr_sddmm(ops[0], q, ops[1])      # noqa: E731
            fmt = f"bsr_pallas_{bm}x{bk}"
        else:
            dev = DeviceCOO.from_csr(mask)
            fn = lambda ops, q: sddmm_coo(ops[0], q, ops[1])      # noqa: E731
            fmt = "coo"

        timed = time_kernel_chained(
            fn, xd, operands=(dev, zd),
            min_time_s=config.min_time_s,
            flops=flops, bytes_accessed=bytes_accessed,
        )

        row = BenchRow(
            matrix_name=mask.name or f"mask_{length}",
            kernel="sddmm_pallas" if use_pallas else "sddmm_xla",
            fmt=fmt,
            dtype=config.dtype,
            device=chip.name,
            input_columns=n,
            csr_m=mask.m, csr_k=mask.k, csr_nnz=mask.nnz,
            csr_mem_footprint_mb=mask.mem_footprint / (1 << 20),
            fmt_mem_footprint_mb=_fmt_footprint(dev) / (1 << 20),
            time=timed.time_per_iter_s,
            iters=timed.iters,
            gflops=timed.gflops or math.nan,
            gbytes_per_s=timed.gbytes_per_s or math.nan,
            sol_time=roofline_time(flops, bytes_accessed, chip, config.dtype),
            roofline_frac=min(
                roofline_time(flops, bytes_accessed, chip, config.dtype)
                / timed.time_per_iter_s, 9.99),
        )

        if check_accuracy:
            # float64 gold restricted to mask nnz, chunked to bound the
            # (chunk, n) f64 intermediates on multi-Mnnz masks
            rows_idx = np.repeat(np.arange(mask.m), mask.degrees)
            gold = np.empty(mask.nnz, dtype=np.float64)
            chunk = 1 << 20
            for s in range(0, mask.nnz, chunk):
                e = min(s + chunk, mask.nnz)
                gold[s:e] = np.einsum(
                    "nd,nd->n", x[rows_idx[s:e]].astype(np.float64),
                    z[mask.col_idx[s:e]].astype(np.float64))
            gold *= mask.values.astype(np.float64)
            out = fn((dev, zd), xd)
            if use_pallas:
                # extract per-nnz values from the mask-aligned BSR blocks
                test = _bsr_blocks_to_nnz(dev, np.asarray(out), mask, rows_idx)
            else:
                test = np.asarray(out)[: mask.nnz]
            eps = config.epsilon if config.dtype != "float32" else 1e-4
            mres = error_metrics(gold, test.astype(np.float64), epsilon=eps)
            row.mae, row.max_ae, row.mse = mres.mae, mres.max_ae, mres.mse
            row.mape, row.smape = mres.mape, mres.smape
            row.lnQ_error, row.mlare, row.gmare = (mres.lnQ_error, mres.mlare,
                                                   mres.gmare)
            row.errors_passed = int(mres.passed)
            if not mres.passed:
                print(f"Test failed! sddmm {mask.name}: "
                      f"max_rel_diff={mres.max_rel_diff:.3e}")
    return row


def _bsr_blocks_to_nnz(dev, blocks_out: np.ndarray, mask: CSRMatrix,
                       rows_idx: np.ndarray) -> np.ndarray:
    """Gather per-nnz values out of mask-aligned BSR value blocks."""
    bm, bk = dev.bm, dev.bk
    cols_idx = mask.col_idx
    br = rows_idx.astype(np.int64) // bm
    bc = cols_idx.astype(np.int64) // bk
    # dense (block_row, block_col) -> block index lookup table
    block_rows = np.asarray(dev.block_rows)[: dev.num_blocks].astype(np.int64)
    block_cols = np.asarray(dev.block_cols)[: dev.num_blocks].astype(np.int64)
    kb = -(-mask.k // bk)
    lut = np.full((dev.mb + 1) * kb, -1, dtype=np.int64)
    lut[block_rows * kb + block_cols] = np.arange(dev.num_blocks)
    bi = lut[br * kb + bc]
    assert (bi >= 0).all()
    return blocks_out[bi, rows_idx % bm, cols_idx % bk]

"""Probe: what gather ops does Mosaic support inside Pallas, and how fast?

Tests take_along_axis lane gathers at widths 128/512/1024+ and sublane
take, then times the winner in a tight loop.  Informs the round-2
hypersparse SpMM kernel design (VERDICT item 1).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgrid.core.timing import time_kernel_chained


def try_compile(name, kernel, out_shape, inputs):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in inputs],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(fn)(*inputs)
        r.block_until_ready()
        print(f"{name:44s} OK", flush=True)
        return r
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:150]
        print(f"{name:44s} FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    rng = np.random.default_rng(0)

    # 1. lane gather width 128
    src = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)

    def k_lane128(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    r = try_compile("take_along_axis lanes (8,128)", k_lane128,
                    jax.ShapeDtypeStruct((8, 128), jnp.float32), (src, idx))
    if r is not None:
        gold = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
        print("   correct:", np.allclose(r, gold), flush=True)

    # 2. lane gather width 512 (idx in [0,512))
    src5 = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32)
    idx5 = jnp.asarray(rng.integers(0, 512, (8, 512)), jnp.int32)
    r = try_compile("take_along_axis lanes (8,512)", k_lane128,
                    jax.ShapeDtypeStruct((8, 512), jnp.float32),
                    (src5, idx5))
    if r is not None:
        gold = np.take_along_axis(np.asarray(src5), np.asarray(idx5), axis=1)
        print("   correct:", np.allclose(r, gold), flush=True)

    # 2b. wide source (8, 3328), idx (8, 128) in [0, 3328): gather 128 of W
    srcw = jnp.asarray(rng.standard_normal((8, 3328)), jnp.float32)
    idxw = jnp.asarray(rng.integers(0, 3328, (8, 128)), jnp.int32)

    def k_lanew(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    r = try_compile("take_along_axis lanes src(8,3328) idx128", k_lanew,
                    jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    (srcw, idxw))
    if r is not None:
        gold = np.take_along_axis(np.asarray(srcw), np.asarray(idxw), axis=1)
        print("   correct:", np.allclose(r, gold), flush=True)

    # 3. larger 2nd-minor: (128, 128) lane gather (16 tiles)
    srcb = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    idxb = jnp.asarray(
        np.broadcast_to(rng.integers(0, 128, (1, 128)), (128, 128)).copy(),
        jnp.int32)
    r = try_compile("take_along_axis lanes (128,128) bcast idx", k_lane128,
                    jax.ShapeDtypeStruct((128, 128), jnp.float32),
                    (srcb, idxb))
    if r is not None:
        gold = np.take_along_axis(np.asarray(srcb), np.asarray(idxb), axis=1)
        print("   correct:", np.allclose(r, gold), flush=True)

    # 4. sublane gather: take along axis 0, src (512, 128)
    srcs = jnp.asarray(rng.standard_normal((512, 128)), jnp.float32)
    idxs = jnp.asarray(rng.integers(0, 512, (8, 128)), jnp.int32)

    def k_sub(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    r = try_compile("take_along_axis sublanes src(512,128) idx(8,128)",
                    k_sub, jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    (srcs, idxs))
    if r is not None:
        gold = np.take_along_axis(np.asarray(srcs), np.asarray(idxs), axis=0)
        print("   correct:", np.allclose(r, gold), flush=True)

    # 5. dynamic VMEM row reads: stack 8 dynamic rows
    def k_rows(s_ref, i_ref, o_ref):
        rows = [s_ref[pl.ds(i_ref[0, r], 1), :] for r in range(8)]
        o_ref[:] = jnp.concatenate(rows, axis=0)

    idxr = jnp.asarray(rng.integers(0, 512, (8, 128)), jnp.int32)
    try_compile("stack of 8 dynamic VMEM rows", k_rows,
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
                (srcs, idxr))


if __name__ == "__main__":
    main()

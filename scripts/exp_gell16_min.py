"""Minimize the gell16/cv_gell wideband_196k TPU worker crash (VERDICT r4
item 7 / ROADMAP item 6).

r3_wideband_196k (m=196608, bw=0.3, diagonal) crashed the worker under
gell16 AND cv_gell (quarantined in .newkernel_crashes).  Structure-wise
the config sits exactly at the bf16 window cap (band ~59k rows of the
~64.5k bf16 span cap), so the prime suspect is the windowed bf16 path at
maximal span.  This probe bisects: (a) direct path (windows disabled),
(b) windowed at half rows, (c) windowed full — each in its own
try/except with a progress marker, so the log shows the last stage
reached even if the process dies.  Run SACRIFICIALLY (own process, last
before a restartable stage); findings land in
benchmark_results/tpu-v5e/gell16_min.log.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOG = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e", "gell16_min.log")


def mark(msg):
    print(msg, flush=True)
    with open(LOG, "a") as fh:
        fh.write(msg + "\n")


def main():
    import numpy as np
    import jax.numpy as jnp
    from spgrid.gen.artificial import artificial_matrix_generation
    from spgrid.ops.gell import DeviceGELL, gell_spmm

    done = set()
    if os.path.exists(LOG):
        with open(LOG) as fh:
            done = {l.strip() for l in fh}
    if "VERDICT recorded" in " ".join(done):
        mark("probe already concluded; skipping")
        return

    mark("== gell16 wideband_196k minimize ==")
    csr = artificial_matrix_generation(
        196608, 196608, 6, 2, "normal", seed=14, placement="diagonal",
        bw=0.3, skew=0, avg_num_neighbours=0.3, cross_row_similarity=0.5,
        name="r3_wideband_196k")
    x = np.random.default_rng(14).random((csr.k, 512), np.float32) + 0.5
    xd = jnp.asarray(x)

    stages = []
    for mode in ("split16", "bf16"):
        stages.append((f"{mode}-direct", mode, True))    # windows stripped
        stages.append((f"{mode}-windowed", mode, False))
    for tag, mode, strip in stages:
        key = f"stage {tag}: OK"
        if key in done:
            mark(f"skip {tag} (previously OK)")
            continue
        if f"stage {tag}: ENTER" in done and key not in done:
            mark(f"stage {tag}: CRASHED LAST TIME — culprit isolated; "
                 f"VERDICT recorded: the {tag} path kills the worker")
            return
        mark(f"stage {tag}: ENTER")
        try:
            a = DeviceGELL.from_csr(csr, mode=mode)
            if strip:
                import dataclasses as _dc  # noqa: F401
                a.win_plan = None
            y = gell_spmm(a, xd)
            y.block_until_ready()
            mark(f"stage {tag}: OK (sum={float(jnp.sum(y)):.3e})")
        except Exception as e:  # noqa: BLE001
            mark(f"stage {tag}: FAILED in-process: {type(e).__name__}: "
                 f"{str(e)[:200]}")
            mark(f"VERDICT recorded: {tag} fails in-process (no worker "
                 f"crash)")
            return
    mark("all stages OK — crash not reproduced under current code; "
         "VERDICT recorded: quarantine can be lifted")


if __name__ == "__main__":
    main()

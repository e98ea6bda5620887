"""TPU-side debug of gell split modes: localize where take-of-planes
diverges from take-of-f32 (observed mape ~0.2 in the full kernel on TPU
while _split_planes reconstructs exactly)."""
import numpy as np
import jax
import jax.numpy as jnp

from spgrid.ops.gell import _split_planes


def main():
    rng = np.random.default_rng(0)
    k, n = 2048, 64
    x = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, k, 5000).astype(np.int32))

    @jax.jit
    def f(x, idx):
        planes = _split_planes(x, 3)
        g = sum(jnp.take(p, idx, axis=0).astype(jnp.float32)
                for p in planes)
        gf = jnp.take(x, idx, axis=0)
        return g, gf

    g, gf = f(x, idx)
    g, gf = np.asarray(g, np.float64), np.asarray(gf, np.float64)
    eq = np.array_equal(g, gf)
    print("take-of-planes == take-f32:", eq,
          "maxdiff", float(np.abs(g - gf).max()), flush=True)
    if not eq:
        bad = np.argwhere(g != gf)
        r, c = bad[0]
        xa = np.asarray(x)
        print("first bad at", r, c, "idx", int(idx[r]),
              "got", g[r, c], "want", gf[r, c],
              "x", xa[int(idx[r]), c], flush=True)
        # plane values at that element
        ps = jax.jit(lambda x: _split_planes(x, 3))(x)
        pv = [float(np.asarray(p, np.float32)[int(idx[r]), c]) for p in ps]
        print("planes:", pv, "sum", sum(pv), flush=True)
        # takes of each plane separately
        for i, p in enumerate(ps):
            tv = float(np.asarray(jnp.take(p, idx, axis=0))[r, c])
            print(f"take(plane{i})[bad] = {tv}", flush=True)


if __name__ == "__main__":
    main()

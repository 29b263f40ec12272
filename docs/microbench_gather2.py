"""Round-2b microbench: gather throughput by dtype x row-width x coherence.

The wave-3 hlo_stats profile showed in-frame gather rates spread 105-563
M rows/s across VMEM-promoted tables with no obvious single predictor
(u16[4] 8B: 227 M/s, f16[12] 24B: 140 M/s, u8[48]: 563 M/s, f32[24]: 126
M/s).  This sweep isolates dtype, row bytes, table size, and index coherence
so the TAA/PCF/GI table formats can be chosen from data.

Coherent indices = each index is pixel_index + small jitter (the TAA-reproj /
material-uv pattern); random = uniform (worst case).

Run: PYTHONPATH=/root/repo:/root/.axon_site python docs/microbench_gather2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(table, n_rows, coherent, reps=3, iters=8):
    nt = table.shape[0]

    @jax.jit
    def run(seed):
        def body(carry, i):
            acc, key = carry
            key, sub = jax.random.split(key)
            if coherent:
                base = jnp.arange(n_rows, dtype=jnp.int32) % nt
                jit_ = jax.random.randint(sub, (n_rows,), -2, 3)
                idx = jnp.clip(base + jit_, 0, nt - 1)
            else:
                idx = jax.random.randint(sub, (n_rows,), 0, nt)
            rows = jnp.take(table, idx, axis=0)
            acc = acc + rows.astype(jnp.float32).sum()
            return (acc, key), 0.0

        (acc, _), _ = jax.lax.scan(body, (0.0, jax.random.PRNGKey(seed)),
                                   jnp.arange(iters))
        return acc

    float(run(1))
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        float(run(2 + r))
        best = min(best, time.perf_counter() - t0)
    return n_rows * iters / best


def main():
    n_rows = 1 << 21
    cases = []
    for dt, name in [(jnp.uint8, "u8"), (jnp.uint16, "u16"),
                     (jnp.float16, "f16"), (jnp.float32, "f32")]:
        bpe = jnp.zeros((), dt).dtype.itemsize
        for ch in (4, 8, 12, 16, 24, 32, 48):
            rows = (1 << 22) // max(1, bpe)   # ~4MB-worth of rows? keep 1M
            cases.append((f"{name}[{ch:2d}] {ch*bpe:3d}B",
                          jnp.zeros((1 << 20, ch), dt)))
    # table-size sweep at fixed format (u16[4], the PCF/shaft row)
    for logn in (18, 20, 22):
        cases.append((f"u16[4] table {1<<logn} rows",
                      jnp.zeros((1 << logn, 4), jnp.uint16)))
    print(f"backend: {jax.devices()[0].platform}, rows/iter {n_rows}")
    print(f"{'format':26s} {'random':>10s} {'coherent':>10s}  (M rows/s)")
    for name, table in cases:
        rr = bench(table, n_rows, False)
        rc = bench(table, n_rows, True)
        print(f"{name:26s} {rr/1e6:10.1f} {rc/1e6:10.1f}", flush=True)


if __name__ == "__main__":
    main()

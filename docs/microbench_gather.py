"""Round-2 microbench: gather row-format sweep on the real TPU.

Informs the gather-elimination roadmap (docs/PERF_NOTES.md): measures rows/s
for the candidate packed-row formats of each hot table.  Methodology per
CLAUDE.md: in-device lax.scan loops, vary inputs, fetch a scalar.

Run: PYTHONPATH=/root/repo:/root/.axon_site python docs/microbench_gather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_gather(table, n_rows, reps=3, iters=8):
    """Measure gathers/s: n_rows random gathers from table, iters times."""
    nt = table.shape[0]

    @jax.jit
    def run(seed):
        def body(carry, i):
            acc, key = carry
            key, sub = jax.random.split(key)
            idx = jax.random.randint(sub, (n_rows,), 0, nt)
            rows = jnp.take(table, idx, axis=0)
            acc = acc + rows.astype(jnp.float32).sum()
            return (acc, key), 0.0

        (acc, _), _ = jax.lax.scan(body, (0.0, jax.random.PRNGKey(seed)),
                                   jnp.arange(iters))
        return acc

    run(0).block_until_ready()
    float(run(1))  # force
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        float(run(2 + r))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return n_rows * iters / best


def main():
    n_rows = 1 << 21  # ~2M rows per iter (one frame's worth)
    formats = [
        ("f32[4]   16B  (tri_meta)", jnp.zeros((1 << 20, 4), jnp.float32)),
        ("f32[8]   32B  (vertex row)", jnp.zeros((1 << 20, 8), jnp.float32)),
        ("f32[16]  64B  (PCF window)", jnp.zeros((1 << 20, 16), jnp.float32)),
        ("bf16[16] 32B", jnp.zeros((1 << 20, 16), jnp.bfloat16)),
        ("f32[32] 128B  (lightgrid win)", jnp.zeros((1 << 19, 32), jnp.float32)),
        ("bf16[32] 64B  (lightgrid win bf16)", jnp.zeros((1 << 19, 32), jnp.bfloat16)),
        ("f32[48] 192B  (mat window f32)", jnp.zeros((1 << 18, 48), jnp.float32)),
        ("bf16[48] 96B  (mat window bf16)", jnp.zeros((1 << 18, 48), jnp.bfloat16)),
        ("u8[48]   48B  (mat window u8)", jnp.zeros((1 << 18, 48), jnp.uint8)),
        ("u8[12]   12B  (mat nearest u8)", jnp.zeros((1 << 18, 12), jnp.uint8)),
        ("bf16[12] 24B  (mat nearest bf16)", jnp.zeros((1 << 18, 12), jnp.bfloat16)),
        ("bf16[48] small table 256K rows", jnp.zeros((1 << 18, 48), jnp.bfloat16)),
        ("bf16[32] small table 64^3 rows", jnp.zeros((64 ** 3, 32), jnp.bfloat16)),
        ("f32[4]  tiny table 512KB", jnp.zeros((1 << 15, 4), jnp.float32)),
    ]
    print(f"backend: {jax.devices()[0].platform}, rows per iter: {n_rows}")
    for name, table in formats:
        rate = bench_gather(table, n_rows)
        print(f"{name:38s} {rate/1e6:8.1f} M rows/s")


if __name__ == "__main__":
    main()

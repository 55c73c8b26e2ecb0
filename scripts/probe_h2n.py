"""On-chip A/B: Pallas one-pass h2n vs the XLA jnp lowering.

Honest protocol (bench.py conventions): vary the input every rep so the axon
tunnel cannot dedup dispatches, block on the result, and pull one checksum
per rep to force materialization. Prints ms per call for each variant and
shape, plus bit-equality of the two lowerings.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kanter_core_tpu.ops.height_to_normal import _h2n_jnp
from kanter_core_tpu.ops.pallas_kernels import height_to_normal_pallas

assert jax.default_backend() == "tpu", jax.default_backend()

REPS = 30


def timeit(fn, h0):
    # vary per rep: add a fresh scalar so every dispatch is unique
    outs = fn(h0)
    jax.block_until_ready(outs)
    times = []
    for r in range(REPS):
        h = h0 + jnp.float32(1e-6 * (r + 1))
        jax.block_until_ready(h)
        t0 = time.perf_counter()
        outs = fn(h)
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
        _ = float(outs[0][0, 0])  # force a host pull
    times.sort()
    return times[len(times) // 2]


for size in (1024, 2048, 4096):
    h0 = jnp.asarray(np.random.default_rng(0).random((size, size), np.float32))

    jnp_fn = jax.jit(_h2n_jnp)
    t_jnp = timeit(jnp_fn, h0)

    for tile in (16, 32, 64):
        try:
            pl_fn = jax.jit(lambda h, tile=tile: height_to_normal_pallas(h, tile_rows=tile))
            t_pl = timeit(pl_fn, h0)
            a = jnp_fn(h0)
            b = pl_fn(h0)
            same = all(
                np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b)
            )
            print(
                f"{size}x{size} tile={tile}: pallas {t_pl*1e3:.3f} ms, "
                f"jnp {t_jnp*1e3:.3f} ms, ratio {t_pl/t_jnp:.2f}, bit-equal={same}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{size}x{size} tile={tile}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    gbps = 4 * size * size * 5 / t_jnp / 1e9  # 1 read + 4 writes, f32
    print(f"{size}x{size}: jnp {t_jnp*1e3:.3f} ms (~{gbps:.0f} GB/s effective)", flush=True)

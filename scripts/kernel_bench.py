"""Micro-benchmark the shared-attention kernels in isolation on TPU.

Times shared_flash_attention at the serving shapes (batch 16, refs-only,
AdaIN affine) for each layer size and a grid of algo/block configs, without
paying the full-model compile. One TPU client at a time — do not run while
bench.py / profile_bench.py is active.

Usage: python scripts/kernel_bench.py [layer]   # layer in {64, 32, 16, all}
"""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from instantrestore_tpu.ops.shared_attention import adain_affine, shared_flash_attention

# (grid, heads) per shared layer scale; seq = grid^2, d = 64, N = 4 refs
LAYERS = {"64": (64, 5), "32": (32, 10), "16": (16, 20)}
BATCH = 16
NREF = 4
D = 64


def bench_layer(grid: int, heads: int, algo: str, bq: int, bk: int) -> float:
    s = grid * grid
    key = jax.random.PRNGKey(0)
    mk = lambda k, shape: jax.random.normal(k, shape, jnp.bfloat16)
    q = mk(jax.random.fold_in(key, 0), (BATCH, heads, s, D))
    k_in = mk(jax.random.fold_in(key, 1), (BATCH, heads, s, D))
    v_in = mk(jax.random.fold_in(key, 2), (BATCH, heads, s, D))
    rk = mk(jax.random.fold_in(key, 3), (BATCH, NREF, heads, s, D))
    rv = mk(jax.random.fold_in(key, 4), (BATCH, NREF, heads, s, D))
    aff = adain_affine(v_in, rv)

    @jax.jit
    def run(q, k_in, v_in, rk, rv):
        aff_ = adain_affine(v_in, rv)
        return shared_flash_attention(
            q, k_in, v_in, rk, rv, scale=D ** -0.5, v_affine=aff_,
            include_input=False, algo=algo, block_q=bq, block_k=bk,
        )

    try:
        out = run(q, k_in, v_in, rk, rv)
        out.block_until_ready()
    except Exception as e:
        return float("nan")
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(q, k_in, v_in, rk, rv)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "64"
    layers = LAYERS.items() if which == "all" else [(which, LAYERS[which])]
    configs = []
    for algo in ("kv_outer", "q_outer", "kv_outer_packed"):
        for bq in (512, 1024, 2048):
            for bk in (512, 1024, 2048):
                configs.append((algo, bq, bk))
    for name, (grid, heads) in layers:
        print(f"--- layer {grid}x{grid}, heads {heads}, seq {grid*grid}, "
              f"kv {NREF}x{grid*grid} ---")
        for algo, bq, bk in configs:
            ms = bench_layer(grid, heads, algo, bq, bk)
            print(f"  {algo:16} bq={bq:5} bk={bk:5}  {ms:8.2f} ms")


if __name__ == "__main__":
    main()

"""Block-size sweep for the paired identity shared-attention kernel at the
bench's 64^2 serving shapes (b=16, h=5, sq=4096, d=64, N=4 refs, s=4096).

Run on the real TPU: python scripts/sweep_paired_kernel.py

Times shared_attention_identity for (block_q, cache block_k) combinations;
block_k is the pack interleave period, so each bk gets its own cache build.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from instantrestore_tpu.ops import shared_attention as SA

B, H, SQ, D, N, S = 16, 5, 4096, 64, 4, 4096
I = 16  # identities in the cache


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kvin = jax.random.split(key, 4)
    q = (jax.random.normal(kq, (B, H, SQ, D)) * 0.3).astype(jnp.bfloat16)
    ref_k = (jax.random.normal(kk, (I, N, H, S, D)) * 0.3).astype(jnp.bfloat16)
    ref_v = (jax.random.normal(kv, (I, N, H, S, D)) * 0.3).astype(jnp.bfloat16)
    v_in = (jax.random.normal(kvin, (B, H, SQ, D)) * 0.3).astype(jnp.bfloat16)
    ids = jnp.arange(B, dtype=jnp.int32) % I
    scale = 1.0 / (D ** 0.5)

    ref_out = None
    for bk in (512, 1024, 2048):
        build = jax.jit(
            lambda k_, v_, bk_=bk: SA.build_identity_kv_cache(
                [(k_, v_)], block_k=bk_
            )[0]
        )
        cache = jax.block_until_ready(build(ref_k, ref_v))
        print(f"cache built bk={bk}", flush=True)
        for bq in (256, 512, 1024):
            try:
                fn = jax.jit(
                    lambda q_, vin_, c, ids_, bq_=bq: SA.shared_attention_identity(
                        q_, vin_, vin_, c, ids_, scale=scale, use_adain=True,
                        block_q=bq_,
                    )
                )
                out = fn(q, v_in, cache, ids)
                out.block_until_ready()
                # chain v_in on the previous output (same compiled fn) so the
                # timed calls serialize even if the runtime overlaps dispatch
                n_it = 20
                t0 = time.perf_counter()
                for _ in range(n_it):
                    out = fn(q, out, cache, ids)
                out.block_until_ready()
                dt = (time.perf_counter() - t0) / n_it * 1e3
                if ref_out is None:
                    ref_out = out
                    err = 0.0
                else:
                    err = float(
                        jnp.max(jnp.abs(out.astype(jnp.float32) - ref_out.astype(jnp.float32)))
                    )
                print(f"bk={bk:5d} bq={bq:5d}: {dt:7.3f} ms  maxdiff={err:.2e}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"bk={bk:5d} bq={bq:5d}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

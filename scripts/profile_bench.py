"""Profile the batched serving path on TPU and print a per-op time table.

Captures a jax.profiler trace around steady-state ServingEngine.restore
iterations (same config as bench.py), then parses the perfetto trace JSON
the profiler writes and aggregates device-side op durations by XLA op name —
a poor man's op_profile that needs no tensorboard.

Usage:  python scripts/profile_bench.py [batch]
Output: top-40 ops by total device time + stage buckets.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from instantrestore_tpu.models.restorer import (
    RestorerStatics,
    init_restorer_params,
    serving_bundle,
)
from instantrestore_tpu.inference.serving import ServingEngine


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_ident, n_refs, res = 16, 4, 512
    assert jax.default_backend() == "tpu", jax.default_backend()

    statics = RestorerStatics(use_adain=True, train_input=False)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_restorer_params(
            jax.random.PRNGKey(0), statics, lora_rank_unet=32, lora_rank_vae=32
        )
        params = serving_bundle(params, statics)
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    params = jax.device_put(params, jax.devices()[0])
    eng = ServingEngine(params, statics, use_fused_attention=True)

    refs = jax.random.randint(
        jax.random.PRNGKey(1), (n_ident, n_refs, res, res, 3), 0, 256, jnp.uint8
    )
    images = jax.random.randint(
        jax.random.PRNGKey(2), (batch, res, res, 3), 0, 256, jnp.uint8
    )
    ids = jnp.arange(batch, dtype=jnp.int32) % n_ident

    eng.onboard(refs)
    jax.block_until_ready(eng.kv_cache)
    out = eng.restore(images, ids, jax.random.PRNGKey(3))
    out.block_until_ready()

    # compiled HLO: maps the trace's anonymous fusion.N names to op_name
    # metadata (model path) for readable attribution
    hlo = (
        eng._restore.lower(params, images, eng.kv_cache, ids, jax.random.PRNGKey(3))
        .compile()
        .as_text()
    )
    import re

    meta = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = [^\n]*metadata=\{[^}]*op_name=\"([^\"]+)\""
        r"(?:[^}]*source_file=\"([^\"]+)\")?(?:[^}]*source_line=(\d+))?",
        hlo,
    ):
        src = ""
        if m.group(3):
            src = f" {m.group(3).split('/')[-1]}:{m.group(4) or '?'}"
        meta[m.group(1)] = m.group(2) + src

    trace_dir = "/root/repo/.profiles"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            out = eng.restore(images, ids, jax.random.PRNGKey(10 + i))
        out.block_until_ready()

    # newest trace.json.gz under the trace dir
    paths = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace.json.gz found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device-lane complete events: aggregate by op name
    events = [
        e for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("dur") and e.get("name")
    ]
    # keep XLA ops (they carry args.long_name or look like fusions); drop
    # host-side python/runtime lanes by thread name heuristics
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("jit_") or name.startswith("jit("):
            continue  # whole-program envelope event
        agg[name] += e["dur"]
        total += e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:50]
    print(f"parsed {paths[-1]}")
    print(f"total device op time: {total/1e3/3:.2f} ms/iter over 3 iters\n")
    print(f"{'us/iter':>12}  {'%':>5}  op  [op_name]")
    for name, dur in top:
        where = meta.get(name, "")
        print(f"{dur/3:12.0f}  {100*dur/max(total,1e-9):5.1f}  {name[:40]}  {where[-100:]}")

    # pipeline-stage buckets from the op_name model path (jax named scopes:
    # jit(_restore_impl)/{vae_encode,vae_decode,unet,...}/<op> <file:line>)
    buckets = defaultdict(float)
    for name, dur in agg.items():
        w = meta.get(name, "").lower()
        n = name.lower()
        if "pallas" in n or "pallas_call" in w or "shared_attention" in w:
            buckets["pallas attention"] += dur
        elif "copy" in n or "transpose" in n or "bitcast" in n:
            buckets["copy/transpose"] += dur
        elif "vae_decode" in w or "decoder" in w:
            buckets["vae decode"] += dur
        elif "vae_encode" in w or "encoder" in w:
            buckets["vae encode"] += dur
        elif "unet" in w:
            buckets["unet"] += dur
        elif "preprocess" in w or "resize" in w:
            buckets["preprocess"] += dur
        else:
            buckets["other"] += dur
    print("\nstage buckets (ms/iter):")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:18} {v/1e3/3:8.2f}")

    # stage x op-kind matrix over ALL ops (not just the top-50): separates
    # conv/matmul time (roofline-bound) from the elementwise/reduce fat
    # (GN stats, SiLU, adds) that a fusion pass could still eat
    def kind_of(name, w):
        n = name.lower()
        if "pallas" in n or "pallas_call" in w:
            return "pallas"
        if "conv" in w or "conv" in n:
            return "conv"
        if "dot" in w or "dot" in n or "einsum" in w:
            return "matmul"
        if "copy" in n or "transpose" in n or "bitcast" in n:
            return "copy"
        if "reduce" in w or "reduce" in n or "norm" in w or "var" in w or "mean" in w:
            return "reduce"
        return "elementwise"

    matrix = defaultdict(float)
    for name, dur in agg.items():
        w = meta.get(name, "").lower()
        stage = "other"
        for s in ("vae_decode", "vae_encode", "unet", "preprocess"):
            if s in w:
                stage = s
                break
        matrix[(stage, kind_of(name, w))] += dur
    print("\nstage x kind (ms/iter):")
    stages = sorted({s for s, _ in matrix})
    kinds = ["conv", "pallas", "matmul", "reduce", "elementwise", "copy"]
    print(f"  {'stage':12}" + "".join(f"{k:>12}" for k in kinds))
    for s in stages:
        row = "".join(f"{matrix.get((s, k), 0.0)/1e3/3:12.2f}" for k in kinds)
        print(f"  {s:12}{row}")

    # top non-conv, non-pallas ops — the fusion-pass candidates
    print("\ntop non-conv/non-pallas ops (us/iter):")
    rest = [
        (n, d) for n, d in agg.items()
        if kind_of(n, meta.get(n, "").lower()) in ("reduce", "elementwise", "copy")
    ]
    for name, dur in sorted(rest, key=lambda kv: -kv[1])[:25]:
        where = meta.get(name, "")
        print(f"{dur/3:12.0f}  {name[:40]}  {where[-90:]}")


if __name__ == "__main__":
    main()

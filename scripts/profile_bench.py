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
    # metadata (model path) for readable attribution. Lower with the SAME
    # per-sample key batch restore() passes (serving._per_sample_keys) so
    # this is the executed program, not a single-key sibling with
    # different fusion numbering.
    from instantrestore_tpu.inference.serving import _per_sample_keys

    keys = _per_sample_keys(jax.random.PRNGKey(3), batch)
    hlo = (
        eng._restore.lower(params, images, eng.kv_cache, ids, keys)
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

    # per-convolution table with shapes and estimated MXU utilization: the
    # round-4 stage x kind matrix showed UNet convs at ~38-50% MXU while the
    # (128-multiple-channel) VAE convs sit at 84-98% — this resolves WHICH
    # convs lose, from the HLO result/operand shapes + measured time.
    shape_of = {}   # instruction name -> result shape string like bf16[16,64,64,320]
    for m in re.finditer(r"%?([\w.\-]+) = ([a-z0-9]+\[[\d,]*\])", hlo):
        shape_of[m.group(1)] = m.group(2)
    conv_lines = {}  # fusion/conv instruction -> (result, rhs shape) for convs
    for m in re.finditer(
        r"%?([\w.\-]+) = ([a-z0-9]+\[[\d,]*\])[^\n]*convolution\(%?([\w.\-]+), %?([\w.\-]+)\)",
        hlo,
    ):
        conv_lines[m.group(1)] = (m.group(2), shape_of.get(m.group(3), "?"),
                                  shape_of.get(m.group(4), "?"))
    # trace events are named after the top-level fusion; a fusion wrapping a
    # conv keeps the conv as an inner instruction — attribute by scanning the
    # fusion body for its called computation's convolution line
    fusion_conv = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = [a-z0-9]+\[[\d,]*\][^\n]*fusion\([^\n]*calls=%?([\w.\-]+)",
        hlo,
    ):
        fusion_conv[m.group(1)] = m.group(2)
    comp_convs = {}  # computation name -> first conv inner instruction name
    cur_comp = None
    for line in hlo.splitlines():
        mm = re.match(r"%?([\w.\-]+) \(", line.strip())
        if line and not line.startswith(" ") and "{" in line:
            mc = re.search(r"%?([\w.\-]+) \(", line)
            cur_comp = mc.group(1) if mc else None
        elif cur_comp and " convolution(" in line:
            mi = re.match(r"\s*%?([\w.\-]+) =", line)
            if mi and cur_comp not in comp_convs:
                comp_convs[cur_comp] = mi.group(1)

    def flops_of(res, lhs, rhs):
        # conv FLOPs = 2 * prod(result spatial+batch+outC) * (kh*kw*inC)
        try:
            rdims = [int(x) for x in res.split("[")[1].rstrip("]").split(",")]
            kdims = [int(x) for x in rhs.split("[")[1].rstrip("]").split(",")]
        except Exception:
            return 0
        # rhs kernel layout on TPU HLO is usually [kh,kw,inC,outC] or
        # [outC,inC,kh,kw]; take prod(kernel)/outC as the per-output work,
        # where outC = the kernel dim matching the result minor dim
        out_c = rdims[-1] if rdims else 1
        kprod = 1
        for x in kdims:
            kprod *= x
        per_out = kprod // max(out_c, 1) if out_c in kdims else kprod
        n_out = 1
        for x in rdims:
            n_out *= x
        return 2 * n_out * per_out

    peak = float(os.environ.get("PROFILE_PEAK_TFLOPS", "197")) * 1e12
    rows = []
    for name, dur in agg.items():
        conv = None
        if name in conv_lines:
            conv = conv_lines[name]
        elif name in fusion_conv and comp_convs.get(fusion_conv[name]) :
            inner = comp_convs[fusion_conv[name]]
            conv = conv_lines.get(inner)
        if conv is None and name in fusion_conv:
            # fall back: any conv instruction whose name prefixes match
            continue
        if conv is None:
            continue
        fl = flops_of(*conv)
        sec = dur / 3 / 1e6
        mxu = fl / max(sec, 1e-12) / peak
        rows.append((dur / 3, mxu, fl, conv, name))
    if rows:
        print("\nconvolutions by time (us/iter, est-MXU%, GFLOP, result, kernel):")
        for dur_us, mxu, fl, conv, name in sorted(rows, key=lambda r: -r[0])[:40]:
            w = meta.get(name, "")
            print(
                f"{dur_us:10.0f}  {100*mxu:5.1f}%  {fl/1e9:8.1f}  "
                f"{conv[0]:>22} k={conv[2]:>20}  {w[-60:]}"
            )


if __name__ == "__main__":
    main()

"""Attribute one warm batch-N generate's wall time to phases using the
device trace timeline: conditioning (ops before the DDIM while loop),
denoise loop (the while op itself), decode (VAE+vocoder ops after it), and
host gap (wall minus device-busy span). No extra compiles — one trace of
the already-cached executable.

Usage: AP_BENCH_BATCH=24 python scripts/profile_phases.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("AP_BENCH_BATCH", "24"))
STEPS = int(os.environ.get("AP_BENCH_STEPS", "50"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ap_adapter_tpu.configs import PipelineConfig
    from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline
    from ap_adapter_tpu.pipeline.tokenize import make_text_batch

    config = PipelineConfig()
    pipe = AudioLDM2Pipeline.from_random(config, seed=0)
    pos = make_text_batch(config, ["Trumpet solo"] * BATCH, t5_len=64)
    neg = make_text_batch(config, ["low quality"] * BATCH, t5_len=64)
    rng = np.random.default_rng(0)

    if os.environ.get("AP_SDEDIT", "0") == "1":
        # SDEdit (style transfer) phase attribution — BASELINE row 2's flat
        # batch scaling: is the un-amortized piece the VAE encode/text stack?
        from ap_adapter_tpu.pipeline.style_transfer import generate_style_transfer

        src = rng.standard_normal(16000 * 10).astype(np.float32) * 0.1
        pos_b = make_text_batch(config, ["Trumpet solo"] * BATCH, t5_len=64)

        def call(seed):
            return generate_style_transfer(
                pipe, src, 16000, pos_b, neg, audio_length_in_s=10.0,
                num_inference_steps=STEPS, guidance_scale=9.5, ap_scale=0.55,
                time_pool=4, freq_pool=4, seed=seed)
    else:
        fbank = jnp.asarray(
            rng.standard_normal((BATCH, *config.audiomae.img_size)).astype(np.float32))
        kwargs = dict(audio_length_in_s=10.0, num_inference_steps=STEPS,
                      guidance_scale=7.5, ap_scale=0.5, time_pool=2, freq_pool=2)

        def call(seed):
            return pipe.generate(pos, neg, fbank, seed=seed, **kwargs)

    call(0)  # warm

    # wall time over 2 materialized calls
    t0 = time.perf_counter()
    for i in range(2):
        call(10 + i)
    wall = (time.perf_counter() - t0) / 2

    log_dir = "/tmp/jax_trace_phases"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    call(99)
    jax.profiler.stop_trace()

    traces = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {log_dir}"
    with gzip.open(sorted(traces)[-1], "rt") as f:
        t = json.load(f)

    pid_names = {}
    for e in t["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}

    # all device complete-events; find the top-level while (the DDIM scan —
    # the longest single op)
    evs = [e for e in t["traceEvents"]
           if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e]
    if not evs:
        print("no device events found; pids:", pid_names)
        return
    whiles = [e for e in evs if e["name"].startswith("while")]
    main_while = max(whiles, key=lambda e: e["dur"]) if whiles else None

    span_start = min(e["ts"] for e in evs)
    span_end = max(e["ts"] + e["dur"] for e in evs)

    def top_level(es):
        """Drop events nested inside a longer enclosing event (fusions inside
        the while are children; keep only outermost)."""
        es = sorted(es, key=lambda e: (e["ts"], -e["dur"]))
        out, cur_end = [], -1
        for e in es:
            if e["ts"] >= cur_end:
                out.append(e)
                cur_end = e["ts"] + e["dur"]
        return out

    tops = top_level(evs)
    w0 = main_while["ts"] if main_while else span_end
    w1 = w0 + (main_while["dur"] if main_while else 0)
    pre = sum(e["dur"] for e in tops if e["ts"] + e["dur"] <= w0) / 1e6
    post = sum(e["dur"] for e in tops if e["ts"] >= w1) / 1e6
    loop = (main_while["dur"] / 1e6) if main_while else 0.0
    busy = sum(e["dur"] for e in tops) / 1e6
    span = (span_end - span_start) / 1e6
    dev_idle = span - busy

    print(f"batch {BATCH}, {STEPS} steps; wall/call {wall:.3f} s")
    print(f"  conditioning (pre-while device):  {pre:8.3f} s")
    print(f"  denoise while loop:               {loop:8.3f} s  ({loop/STEPS*1e3:.1f} ms/step)")
    print(f"  decode (post-while device):       {post:8.3f} s")
    print(f"  other top-level device:           {busy - pre - loop - post:8.3f} s")
    print(f"  device-idle gaps inside span:     {dev_idle:8.3f} s")
    print(f"  host (wall - device span):        {wall - span:8.3f} s")
    # biggest post-while ops
    posts = sorted((e for e in tops if e["ts"] >= w1), key=lambda e: -e["dur"])[:12]
    print("  top post-while ops:")
    for e in posts:
        print(f"    {e['name'][:60]:<60s} {e['dur']/1e3:9.2f} ms")
    pres = sorted((e for e in tops if e["ts"] + e["dur"] <= w0), key=lambda e: -e["dur"])[:8]
    print("  top pre-while ops:")
    for e in pres:
        print(f"    {e['name'][:60]:<60s} {e['dur']/1e3:9.2f} ms")

    # ---- inside the while: group child ops by exact name (so hot individual
    # fusions can be looked up in the HLO), and by base-name class
    if main_while is not None:
        import collections
        import re
        inside = [e for e in evs
                  if e is not main_while and e["ts"] >= w0 and e["ts"] + e["dur"] <= w1]
        by_name = collections.Counter()
        n_name = collections.Counter()
        by_base = collections.Counter()
        n_base = collections.Counter()
        for e in inside:
            by_name[e["name"]] += e["dur"] / 1e3
            n_name[e["name"]] += 1
            base = re.sub(r"[.\d]+$", "", e["name"])
            by_base[base] += e["dur"] / 1e3
            n_base[base] += 1
        print(f"\n  in-loop op classes ({len(inside)} events):")
        for name, ms in by_base.most_common(18):
            print(f"    {name:<44s} {ms:9.1f} ms {n_base[name]:7d}x  {ms/STEPS:7.3f} ms/step")
        print("\n  top individual in-loop ops:")
        for name, ms in by_name.most_common(40):
            print(f"    {name:<44s} {ms:9.1f} ms {n_name[name]:7d}x  {ms/STEPS:7.3f} ms/step")


if __name__ == "__main__":
    main()

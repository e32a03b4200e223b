"""Attribute per-step device time to INDIVIDUAL HLO ops (not just op-class
totals like scripts/profile_generate.py): traces one warm generate, prints the
top-N single ops by total time, and — with AP_DUMP_HLO=1 — dumps the optimized
HLO so a flagged `fusion.1234` can be looked up
(`grep -n 'fusion.1234 =' /tmp/hlo/*denoise*txt`).

The round-2/3 traces put ~29 ms/step in ~1800 elementwise fusions + ~16 ms in
convert_reduce; this narrows WHICH fusions carry that time (reference hot loop:
/root/reference/pipeline/pipeline_audioldm2.py:1001-1031).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("AP_BENCH_BATCH", "24"))
STEPS = int(os.environ.get("AP_STEPS", "50"))
TOP = int(os.environ.get("AP_TOP", "40"))


def main() -> None:
    if os.environ.get("AP_DUMP_HLO", "0") == "1":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_dump_to=/tmp/hlo"
        )
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )

    from ap_adapter_tpu.configs import PipelineConfig
    from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline
    from ap_adapter_tpu.pipeline.tokenize import make_text_batch

    config = PipelineConfig()
    import dataclasses

    if os.environ.get("AP_INT8", "0") == "1":
        config = config.replace(
            unet=dataclasses.replace(config.unet, use_int8=True))
    pipe = AudioLDM2Pipeline.from_random(config, seed=0)
    pos = make_text_batch(config, ["Trumpet solo"] * BATCH, t5_len=64)
    neg = make_text_batch(config, ["low quality"] * BATCH, t5_len=64)
    rng = np.random.default_rng(0)
    fbank = jnp.asarray(
        rng.standard_normal((BATCH, *config.audiomae.img_size)).astype(np.float32))
    kwargs = dict(audio_length_in_s=10.0, num_inference_steps=STEPS,
                  guidance_scale=7.5, ap_scale=0.5, time_pool=2, freq_pool=2)

    np.asarray(pipe.generate(pos, neg, fbank, seed=0, **kwargs))  # warm

    log_dir = "/tmp/jax_trace_fus"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    np.asarray(pipe.generate(pos, neg, fbank, seed=1, **kwargs))
    jax.profiler.stop_trace()

    traces = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {log_dir}"
    with gzip.open(sorted(traces)[-1], "rt") as f:
        t = json.load(f)

    pid_names = {}
    for e in t["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    total = collections.Counter()
    count = collections.Counter()
    grand = 0.0
    for e in t["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("Step", "pjit", "jit_", "XLA", "program")):
            continue
        dur = e.get("dur", 0) / 1e3
        total[name] += dur
        count[name] += 1
        grand += dur

    print(f"total leaf device time: {grand:.1f} ms "
          f"(one batch-{BATCH} generate, {STEPS} steps)")
    print(f"{'op (exact)':<52s} {'ms':>8s} {'calls':>6s} {'ms/step':>8s}")
    for name, ms in total.most_common(TOP):
        print(f"{name:<52s} {ms:8.1f} {count[name]:6d} {ms/STEPS:8.3f}")


if __name__ == "__main__":
    main()

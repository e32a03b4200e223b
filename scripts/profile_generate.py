"""Trace one warm batch-8 generate on the real TPU and print the top device
ops by total time (parses the jax.profiler perfetto trace)."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os
BATCH, STEPS = int(_os.environ.get("AP_BENCH_BATCH", "8")), 50


def main() -> None:
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

    if _os.environ.get("AP_USE_PALLAS_GN") == "1":
        config = config.replace(
            unet=dataclasses.replace(config.unet, use_pallas_groupnorm=True))
    if _os.environ.get("AP_USE_PALLAS_RESNET", "0") == "1":
        config = config.replace(
            unet=dataclasses.replace(config.unet, use_pallas_resnet=True))
    if _os.environ.get("AP_INT8", "0") == "1":
        config = config.replace(
            unet=dataclasses.replace(config.unet, use_int8=True))
    pipe = AudioLDM2Pipeline.from_random(config, seed=0)
    pos = make_text_batch(config, ["Trumpet solo"] * BATCH, t5_len=64)
    neg = make_text_batch(config, ["low quality"] * BATCH, t5_len=64)
    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.standard_normal((BATCH, *config.audiomae.img_size)).astype(np.float32))
    kwargs = dict(audio_length_in_s=10.0, num_inference_steps=STEPS,
                  guidance_scale=7.5, ap_scale=0.5, time_pool=2, freq_pool=2)

    pipe.generate(pos, neg, fbank, seed=0, **kwargs)  # warm

    log_dir = "/tmp/jax_trace_gen"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    pipe.generate(pos, neg, fbank, seed=1, **kwargs)
    jax.profiler.stop_trace()

    traces = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {log_dir}"
    with gzip.open(sorted(traces)[-1], "rt") as f:
        t = json.load(f)

    # device-side complete events only (TensorCore pids)
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
        if name.startswith(("fusion", "loop_", "while", "copy", "convert", "dynamic",
                            "custom", "reduce", "broadcast", "transpose", "dot",
                            "convolution", "scatter", "gather", "select", "rsqrt",
                            "exponential", "add", "multiply", "subtract", "divide",
                            "bitcast", "slice", "concatenate", "pad", "reshape",
                            "iota", "compare", "tanh", "log", "power", "maximum",
                            "minimum", "negate", "sign", "floor", "rem", "xor",
                            "and", "or", "not", "clamp", "abs", "sqrt", "cbrt")):
            base = re.sub(r"[.\d]+$", "", name)
            dur = e.get("dur", 0) / 1e3  # ms
            total[base] += dur
            count[base] += 1
            grand += dur

    print(f"total device op time: {grand:.1f} ms (one batch-{BATCH} generate, {STEPS} steps)")
    print(f"{'op':<44s} {'ms':>9s} {'calls':>7s} {'ms/step':>8s}")
    for name, ms in total.most_common(30):
        print(f"{name:<44s} {ms:9.1f} {count[name]:7d} {ms/STEPS:8.2f}")


if __name__ == "__main__":
    main()

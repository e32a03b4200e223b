"""Multi-process distributed training: two processes x 4 virtual CPU devices
form one 8-device global mesh and run the real sharded adapter train step
(the CPU stand-in for a 2-host TPU slice — SURVEY §2.5 multi-host plan;
replaces the reference's accelerate DDP, train_apadapter_v2.py:548-552)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


needs_cpus = pytest.mark.skipif(
    (os.cpu_count() or 1) < 2,
    reason="two jax processes compiling concurrently thrash a 1-CPU host "
           "(each child has a 600 s budget)",
)


@pytest.fixture(scope="module")
def worker_runs(tmp_path_factory):
    """Launch the 2-process worker pair ONCE; both the training and the
    serving assertions consume its outputs (a second spawn would double the
    compile-heavy subprocess cost)."""

    if (os.cpu_count() or 1) < 2:
        pytest.skip("needs >= 2 CPUs")
    tmp = tmp_path_factory.mktemp("serve")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID", "COORDINATOR_ADDRESS")}
    serve_paths = [str(tmp / f"serve{pid}.npy") for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multiproc_worker.py"),
             str(pid), coord, serve_paths[pid]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    return outs, serve_paths


@needs_cpus
def test_two_process_train_step(worker_runs):
    outs, _ = worker_runs
    for tag in ("LOSSES", "ACCUM_LOSSES"):
        losses = []
        for out in outs:
            line = [l for l in out.splitlines() if l.startswith(tag + " ")]
            assert line, out[-2000:]
            losses.append([float(v) for v in line[0].split()[1:]])
        # the global all-reduced loss must be identical on both hosts
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
        # and the step actually trained (finite, changing)
        assert losses[0][0] != losses[0][1]


@needs_cpus
def test_two_process_serving_matches_single_process(worker_runs):
    """Multi-host SERVING (VERDICT r4 item 8, SURVEY §2.5): each worker
    fbank-preps only ITS OWN clips on its host CPU, the global batch
    assembles across the 2x4 process mesh, and one sharded generate runs.
    The two hosts' output shards must equal the single-process pipeline on
    identical seeds — the mesh shards the batch only."""

    import jax
    import jax.numpy as jnp

    from ap_adapter_tpu.configs import tiny_pipeline_config
    from ap_adapter_tpu.pipeline.pipeline import (
        AudioLDM2Pipeline, PipelineModules, TextBatch)

    outs, serve_paths = worker_runs
    for out in outs:
        assert "SERVE_OK" in out, out[-2000:]

    # single-process reference on the SAME deterministic input stream
    cfg = tiny_pipeline_config()
    pipe = AudioLDM2Pipeline(cfg, PipelineModules(cfg).init_params(seed=0))
    b = 8
    rng2 = np.random.default_rng(7)  # must mirror multiproc_worker.py
    src = rng2.standard_normal((b, 3200)).astype(np.float32) * 0.1
    ci = rng2.integers(2, cfg.clap.vocab_size, (b, 6)).astype(np.int32)
    ti = rng2.integers(2, cfg.t5.vocab_size, (b, 5)).astype(np.int32)
    nci = rng2.integers(2, cfg.clap.vocab_size, (b, 6)).astype(np.int32)
    nti = rng2.integers(2, cfg.t5.vocab_size, (b, 5)).astype(np.int32)
    fbank = jnp.concatenate(
        [pipe.prepare_fbank(w, cfg.fbank.sample_rate) for w in src], axis=0)
    pos = TextBatch(clap_ids=jnp.asarray(ci), clap_mask=jnp.ones((b, 6), jnp.int32),
                    t5_ids=jnp.asarray(ti), t5_mask=jnp.ones((b, 5), jnp.int32))
    neg = TextBatch(clap_ids=jnp.asarray(nci), clap_mask=jnp.ones((b, 6), jnp.int32),
                    t5_ids=jnp.asarray(nti), t5_mask=jnp.ones((b, 5), jnp.int32))
    ref = pipe.generate(pos, neg, fbank, audio_length_in_s=0.2,
                        num_inference_steps=2, guidance_scale=3.0,
                        ap_scale=0.5, time_pool=2, freq_pool=2, seed=0)

    for pid, path in enumerate(serve_paths):
        got = np.load(path)
        want = ref[pid * 4 : (pid + 1) * 4]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5,
                                   err_msg=f"host {pid} shard diverged")

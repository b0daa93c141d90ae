"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): spectrogram frames/sec/chip for
echoed-speech VQ-VAE *training* at the full reference geometry
(B=64, 201x500 power spectrograms, composite model of train_echoed_speech.py),
on the framework's shipped fast path: the frozen-latent cache in f32.
Secondary fields report the reference-semantics uncached step and the
explicit-bf16 cached step (f32-vs-bf16 is below tunnel noise — see the
comment at the metric and BASELINE.md).

Baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is the measured throughput of the reference's torch training step on this
host's CPU — measured by scripts/bench_reference_cpu.py and recorded below
(see BASELINE.md for the measurement log).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

# frames/sec of the torch reference echoed-speech training step on this
# host's CPU (scripts/bench_reference_cpu.py; see BASELINE.md).
REFERENCE_CPU_FRAMES_PER_SEC = 734.6  # measured 2026-08-16, scripts/bench_reference_cpu.py

# TPU v5e peak bf16 matmul throughput (public spec) — denominator for the
# MFU-style second metric, so the headline doesn't rest solely on the
# 1-CPU-core torch baseline.
V5E_PEAK_BF16_TFLOPS = 197.0


def _conv_flops(b, l, cin, cout, k):  # one Conv1d, stride 1, length-preserving
    return 2.0 * b * l * cin * cout * k


def echoed_step_model_tflops(cfg, batch_size: int, cached: bool = False) -> float:
    """Analytic model FLOPs of one echoed-speech TRAINING step at the
    reference configuration (train_echoed_speech.py:21-31): frozen speech +
    RIR encoder forwards (stop-gradient, so forward only) plus the trained
    composite decoder at 3x forward (fwd + backward wrt activations and
    weights). Matmul/conv terms only — elementwise ops are bandwidth, not
    FLOPs, on TPU. ``cached=True`` counts only the decoder (the frozen-latent
    cache replaces both encoder stacks with codebook gathers)."""
    B, F, T = batch_size, cfg.num_freq, cfg.num_frames  # 64, 201, 500
    H, K = 1024, 1024

    def encoder(l, cin, d, rh, layers):
        f = _conv_flops(B, l, cin, H, 3)  # enc conv_1
        f += layers * (_conv_flops(B, l, H, rh, 3) + _conv_flops(B, l, rh, H, 1))
        f += _conv_flops(B, l, H, d, 3)  # pre_vq
        f += 2.0 * (B * l) * d * K  # VQ distance cross-term matmul
        return f

    speech = encoder(T, F, 128, 1024, 3)  # train_speech.py:32-38
    rir = encoder(F, T, 64, 64, 2)  # train_rir.py:125-136 (transposed input)

    dec_in = 128 + 64
    dec = _conv_flops(B, T, dec_in, H, 3)
    dec += 2 * (_conv_flops(B, T, H, 1024, 3) + _conv_flops(B, T, 1024, H, 1))
    dec += 2 * _conv_flops(B, T, H, H, 3) + _conv_flops(B, T, H, F, 3)

    if cached:
        return (3.0 * dec) / 1e12
    return (speech + rir + 3.0 * dec) / 1e12


def main():
    import jax

    # Persistent compile cache: repeat bench runs skip the multi-minute
    # remote compiles of this environment. TPU-only (cached CPU executables
    # from the remote compiler can mismatch host CPU features).
    if jax.default_backend() != "cpu":
        try:
            jax.config.update(
                "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_compile_tpu")
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:
            pass

    from acoustic_locating_vq_vae_tpu import data as D
    from acoustic_locating_vq_vae_tpu.train import EchoedSpeechTask, Trainer

    cfg = D.DatasetConfig()  # full reference geometry: 201 x 500, 6400-tap RIR
    n_data = 128
    key = jax.random.PRNGKey(0)
    data = D.make_dataset(key, n_data, cfg, batch=32)
    jax.block_until_ready(data.speech_spec)

    task = EchoedSpeechTask(config=cfg)  # B=64, full-width composite
    trainer = Trainer(task, verbose=False, cache_frozen=True)
    state = trainer.init_state(jax.random.PRNGKey(1), data)

    import jax.numpy as jnp

    def best_window(step, operand, st):
        """Best of 5 ten-step windows (the TPU tunnel's throughput varies
        with external load; the best window is closest to uncontended
        capability). The window barrier is a value FETCH — float(sum(loss))
        — NOT block_until_ready, which is not a reliable barrier through the
        tunnel (the repo-wide discipline, CLAUDE.md / latency_bench). No two
        dispatches are identical (donated state chains step to step), so the
        tunnel memo can't serve any of them. Returns (s/step, final state)."""
        st, m = step(st, operand, n_data, True)  # warmup/compile
        float(jnp.sum(m["loss"]))
        windows = []
        for _ in range(5):
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                st, m = step(st, operand, n_data, True)
            float(jnp.sum(m["loss"]))  # fetch = the only trusted barrier
            windows.append((time.perf_counter() - t0) / iters)
        return min(windows), st

    # Reference-semantics step (encoders recomputed every step in f32,
    # matching the torch baseline's work): the round-1 headline, kept for
    # continuity.
    dt_full, state = best_window(trainer._step_fn, data, state)

    # Frozen-latent cache step (Trainer(cache_frozen=True) — numerically
    # equivalent training, see train/loop.py) in f32.
    cache = trainer._build_cache(state, data)
    dt_cached, state = best_window(trainer._step_fn, (data, cache), state)

    # Explicit-bf16 cached step (--cache-frozen --compute-dtype bfloat16;
    # params, losses, and VQ assignment stay f32, train/tasks.py). Params
    # are f32 in both tasks, so the same state carries over; the cache is
    # rebuilt through the bf16 trainer to time exactly what it ships (VQ
    # code assignment is f32 in both, so the codes are identical).
    task_bf16 = EchoedSpeechTask(config=cfg, compute_dtype="bfloat16")
    trainer_bf16 = Trainer(task_bf16, verbose=False, cache_frozen=True)
    cache_bf16 = trainer_bf16._build_cache(state, data)
    dt_bf16, state = best_window(trainer_bf16._step_fn, (data, cache_bf16), state)

    def report(dt, cached):
        frames = task.batch_size * cfg.num_frames / dt
        tflops = echoed_step_model_tflops(cfg, task.batch_size, cached=cached)
        return frames, tflops, tflops / dt

    frames_full, tflops_full, tps_full = report(dt_full, False)
    frames_cached, tflops_cached, tps_cached = report(dt_cached, True)
    frames_bf16, tflops_bf16, tps_bf16 = report(dt_bf16, True)
    out = {
        "metric": "echoed_speech_train_frames_per_sec_per_chip",
        "value": round(frames_cached, 1),
        "unit": "frames/s",
        "vs_baseline": (
            round(frames_cached / REFERENCE_CPU_FRAMES_PER_SEC, 2)
            if REFERENCE_CPU_FRAMES_PER_SEC
            else None
        ),
        # Honest MFU (independent of the CPU baseline): analytic FLOPs the
        # step actually executes / measured time, vs v5e bf16 peak. The
        # cached step executes decoder-only FLOPs — its MFU denominator is
        # NOT the full-step FLOP count.
        "model_tflops_per_step": round(tflops_cached, 3),
        "model_tflops_per_sec": round(tps_cached, 1),
        "mfu_vs_v5e_bf16_peak": round(tps_cached / V5E_PEAK_BF16_TFLOPS, 3),
        # Cached step with explicit bf16 conv compute (--compute-dtype
        # bfloat16). XLA's default TPU conv precision already multiplies in
        # bf16 with f32 accumulation, so the true delta is a few percent —
        # below this tunnel's contention noise (round-3 runs read -25% to
        # +3%, BASELINE.md). The stable f32 step stays the headline.
        "bf16_cached_frames_per_sec": round(frames_bf16, 1),
        "bf16_cached_mfu_vs_v5e_bf16_peak": round(
            tps_bf16 / V5E_PEAK_BF16_TFLOPS, 3
        ),
        # Reference-semantics step (no cache; encoders recomputed like the
        # torch baseline) — the round-1 headline, for continuity.
        "uncached_frames_per_sec": round(frames_full, 1),
        "uncached_vs_baseline": (
            round(frames_full / REFERENCE_CPU_FRAMES_PER_SEC, 2)
            if REFERENCE_CPU_FRAMES_PER_SEC
            else None
        ),
        "uncached_model_tflops_per_step": round(tflops_full, 3),
        "uncached_mfu_vs_v5e_bf16_peak": round(tps_full / V5E_PEAK_BF16_TFLOPS, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("BENCH_ATTEMPT"):
        main()
    else:
        # The TPU tunnel intermittently drops dispatches (observed:
        # UNAVAILABLE broken pipe, INVALID_ARGUMENT / FAILED_PRECONDITION
        # backend errors that clear within minutes). A wedged backend is
        # process-sticky, so retry in a FRESH subprocess; the JSON line of
        # the successful attempt passes through on stdout.
        import subprocess

        ret = 1
        for attempt in range(3):
            ret = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, BENCH_ATTEMPT=str(attempt + 1)),
            ).returncode
            if ret == 0:
                break
            if attempt < 2:
                print(
                    f"bench attempt {attempt + 1} failed (transient tunnel "
                    "error?); retrying in 90s",
                    file=sys.stderr,
                )
                time.sleep(90)
        sys.exit(ret)

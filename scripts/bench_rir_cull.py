"""Chained RIR-synthesis A/B: no cull vs room cull vs geometry-boxed cull.

The round-4 geometry-boxed static culling (dsp/rir.py `source_box` /
`receiver_box`, derived by `data.synth.geometry_boxes`) shipped with lattice
statistics (~10% fewer rows than the room cull, ~6x tighter K intervals) but
its throughput A/B never ran — run J held the tunnel (BASELINE.md round 4).
This is that A/B, run per the repo's tunnel measurement discipline:

- ONE process, variants compiled up front, then interleaved round-robin so
  pool-load spikes land evenly (BASELINE.md round-3 note);
- chained inputs: each iteration's source angles are perturbed by a value
  derived from the previous output, at a scale (1e-4 rad) far above f32 ULP
  on theta, so no two dispatches are identical (the tunnel memoizes);
- windows end on a value FETCH (`float(jnp.sum(out))`) — `block_until_ready`
  is not a reliable barrier through the tunnel.

Geometry matches the flagship runs: full 6400-tap ISM, T60=0.4 (the
BASELINE.md history column), B=32 sources on the run-J source annulus
(radius 0.45-1.45 m around the fixed receiver), which is what the boxes
bound. Reference counterpart: rir.generate (genereate_dataset.py:21-29).

Usage: python scripts/bench_rir_cull.py [--iters 20] [--rounds 4] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "src")

import jax


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20, help="batches per window")
    p.add_argument("--rounds", type=int, default=4, help="windows per variant")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--smoke", action="store_true", help="tiny shapes, 1 round")
    p.add_argument("--platform", default=None, help="jax platform override")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from acoustic_locating_vq_vae_tpu.data.config import DatasetConfig
    from acoustic_locating_vq_vae_tpu.data.synth import geometry_boxes
    from acoustic_locating_vq_vae_tpu.dsp import rir as rirlib

    config = DatasetConfig()
    nsample = 512 if args.smoke else int(config.n_sample)  # 6400 full
    iters = 2 if args.smoke else args.iters
    rounds = 1 if args.smoke else args.rounds
    B = 4 if args.smoke else args.batch
    r_lo, r_hi = 0.45, 1.45  # the run-J source annulus (VALIDATION.md run J)
    source_box, receiver_box = geometry_boxes(config, r_hi)
    receiver = jnp.asarray(config.receiver_position, jnp.float32)
    room = tuple(float(v) for v in config.room_dimensions)

    rng = np.random.default_rng(0)
    theta0 = jnp.asarray(rng.uniform(-np.pi, np.pi, B), jnp.float32)
    radii = jnp.asarray(rng.uniform(r_lo, r_hi, B), jnp.float32)

    def positions(theta):
        # source_coordinates semantics: receiver + (r cos, r sin, Z), upper
        # wall clip (specsdataset.py:38-45) — stays inside geometry_boxes.
        x = receiver[0] + radii * jnp.cos(theta)
        y = receiver[1] + radii * jnp.sin(theta)
        z = jnp.full((B,), receiver[2] + float(config.Z_LOC_SOURCE))
        pos = jnp.stack([x, y, z], axis=-1)
        return jnp.minimum(pos, jnp.asarray(room, jnp.float32))

    def make_variant(**kw):
        def step(theta):
            out = rirlib.generate_rir_batch(
                positions(theta),
                receiver,
                room=room,
                nsample=nsample,
                fs=float(config.fs),
                rt60=float(config.reverberation_time),
                **kw,
            )
            # chain: ULP-visible theta perturbation from the output value
            bump = 1e-4 * jnp.tanh(jnp.sum(out) * 1e3)
            return theta + 1e-4 + bump, out

        return jax.jit(step)

    variants = {
        "no_cull": make_variant(cull=False),
        "room_cull": make_variant(cull=True),
        "boxed_cull": make_variant(
            cull=True, source_box=source_box, receiver_box=receiver_box
        ),
    }

    states, times = {}, {k: [] for k in variants}
    for name, fn in variants.items():  # compile (and warm) up front
        t0 = time.time()
        th, out = fn(theta0)
        float(jnp.sum(out))
        states[name] = th
        print(f"[compile] {name}: {time.time() - t0:.1f}s", file=sys.stderr)

    for r in range(rounds):
        for name, fn in variants.items():
            th = states[name]
            t0 = time.time()
            for _ in range(iters):
                th, out = fn(th)
            float(jnp.sum(out))  # value fetch = the only trusted barrier
            dt = time.time() - t0
            states[name] = th
            times[name].append(dt)
            print(
                f"[round {r}] {name}: {dt / iters * 1e3:.1f} ms/batch "
                f"({B * iters / dt:.0f} RIR/s)",
                file=sys.stderr,
            )

    result = {
        name: {
            "best_rir_per_sec": round(B * iters / min(ts), 1),
            "best_ms_per_batch": round(min(ts) / iters * 1e3, 2),
            "all_rir_per_sec": [round(B * iters / t, 1) for t in ts],
        }
        for name, ts in times.items()
    }
    result["config"] = {
        "batch": B,
        "nsample": nsample,
        "rt60": float(config.reverberation_time),
        "radius_range": [r_lo, r_hi],
        "iters": iters,
        "rounds": rounds,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

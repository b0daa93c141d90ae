"""Evaluate a trained localizer across a grid of reverberation times.

Domain-shift / domain-randomization study tool (VALIDATION.md rounds 2-3):
for each T60 on the grid it synthesizes a fresh held-out set at EXACTLY that
reverberation time (full image-source synthesis — not the training-time RIR
bank, so off-grid generalization is actually exercised) and reports the
joint (or frozen) localizer's angle/coordinate errors. The reference has no
counterpart (its generator pins T60=0.4, genereate_dataset.py:60, and its
evaluation never varies conditions).
"""

import dataclasses
import json

import numpy as np

from _common import base_parser, load_localizer_stages, setup


def main():
    p = base_parser(__doc__)
    p.add_argument(
        "--t60-grid", type=float, nargs="+", default=[0.2, 0.3, 0.4, 0.5, 0.6],
        help="reverberation times to evaluate at (exact synthesis per value)",
    )
    p.add_argument("--n", type=int, default=200, help="held-out samples per condition")
    p.add_argument(
        "--radius-grid", type=float, nargs="+", default=None,
        help="source radii to cross with the T60 grid (default: the config's "
        "fixed R; each condition synthesizes sources at exactly that radius — "
        "the geometry-shift companion to the T60 sweep)",
    )
    p.add_argument(
        "--snr-grid", type=float, nargs="+", default=None,
        help="sensor-noise SNRs in dB to cross with the T60 grid (default: "
        "noiseless, the reference's generator; each condition adds white "
        "noise to the echoed waveform at exactly that SNR — the "
        "noise-robustness companion to the T60 sweep)",
    )
    p.add_argument(
        "--model", choices=["auto", "joint", "frozen"], default="auto",
        help="joint fine-tuned stage, frozen location head, or auto",
    )
    args = p.parse_args()
    if getattr(args, "snr_range", None):
        print(
            "note: --snr-range is a TRAINING-data flag and is ignored by the "
            "per-condition sweep synthesis — use --snr-grid to evaluate at "
            "exact noise levels",
            flush=True,
        )
    args.val_size = 0  # conditions are synthesized per-T60 below
    args.dataset_size = 1
    config, mesh, _, _ = setup(args)

    import jax

    from acoustic_locating_vq_vae_tpu import data as D
    from acoustic_locating_vq_vae_tpu.eval import (
        evaluate_joint_location,
        evaluate_location,
    )
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    task, params, composite_params, use_joint = load_localizer_stages(
        args, config, StageStore(args.store_dir)
    )

    results = {}
    n = 4 if args.smoke else args.n
    radius_grid = args.radius_grid or [config.R]
    max_r = D.max_source_radius(config)
    bad = [r for r in radius_grid if not 0.0 < r < max_r]
    if bad:
        raise SystemExit(
            f"--radius-grid values {bad} leave the room (max in-room source "
            f"radius {max_r:.3f} m around receiver "
            f"{config.receiver_position[:2]}): source_coordinates clips only "
            "at the upper walls, so the sweep would silently evaluate wrong "
            "geometry"
        )
    snr_grid = args.snr_grid or [None]
    conditions = [
        (t, r, s) for t in args.t60_grid for r in radius_grid for s in snr_grid
    ]
    for i, (t60, radius, snr) in enumerate(conditions):
        cfg = dataclasses.replace(
            config, reverberation_time=float(t60), R=float(radius)
        )
        cond_task = dataclasses.replace(task, config=cfg)
        batch = D.make_dataset(
            jax.random.PRNGKey(args.seed + 1000 + i), n, cfg, batch=min(n, 50),
            speech_pool=getattr(args, "_speech_pool", None),
            **({} if snr is None else {"snr_range": (float(snr), float(snr))}),
        )
        if use_joint:
            m = evaluate_joint_location(cond_task, params, batch)
        else:
            m = evaluate_location(cond_task, params, composite_params, batch)
        # bare "0.4" keys when only the T60 axis is swept (round-2 format);
        # explicit "t60=..." keys as soon as any other axis joins the grid
        extra_axes = args.radius_grid is not None or snr is not None
        label = f"t60={t60:g}" if extra_axes else f"{t60:g}"
        if args.radius_grid is not None:
            label += f",R={radius:g}"
        if snr is not None:
            label += f",snr={snr:g}dB"
        results[label] = m
        print(f"{label if extra_axes else f'T60={label}'}: "
              f"{json.dumps(m)}", flush=True)

    rmses = [m["rmse_radians"] for m in results.values()]
    print(
        json.dumps(
            {
                "model": "joint" if use_joint else "frozen",
                "t60_grid": [float(t) for t in args.t60_grid],
                "radius_grid": [float(r) for r in radius_grid],
                "snr_grid_db": None
                if args.snr_grid is None
                else [float(s) for s in snr_grid],
                "rmse_radians_min": min(rmses),
                "rmse_radians_max": max(rmses),
            }
        )
    )


if __name__ == "__main__":
    main()

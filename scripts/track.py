"""Track a MOVING source with the trained localizer.

A serving-facing capability the reference never ships (its scripts stop at
per-sample training metrics): synthesize a piecewise-static trajectory —
the source holds each position for one utterance window (the model's fixed
500-frame input geometry), then moves — at EXACT trajectory geometry
(synthesize_batch(theta=, radius=)), localize every window in ONE batched
device dispatch, and smooth the angle track with a constant-velocity
alpha-beta filter that handles the ±pi seam (eval.tracking). Reports raw
and smoothed tracking RMSE, per-window estimates, and — with a range head
(--predict-radius training) — radial tracking error.

Examples:
    python scripts/track.py --store-dir runE --trajectory arc \
        --theta-start -2.8 --theta-end 2.8 --windows 48
    python scripts/track.py --store-dir runE --trajectory walk \
        --radius-start 0.7 --radius-end 1.3 --out /tmp/track.npz
"""

import json

import numpy as np

from _common import base_parser, build_localizer, setup


def main():
    p = base_parser(__doc__)
    p.add_argument("--windows", type=int, default=24, help="trajectory length (one ~5 s utterance window per position)")
    p.add_argument("--trajectory", choices=["arc", "walk"], default="arc")
    p.add_argument("--theta-start", type=float, default=-2.5, help="arc start angle (rad)")
    p.add_argument("--theta-end", type=float, default=2.5, help="arc end angle (rad; may exceed ±pi to cross the seam)")
    p.add_argument("--radius-start", type=float, default=None, help="source radius at the first window (m; default config.R)")
    p.add_argument("--radius-end", type=float, default=None, help="radius at the last window (default: --radius-start)")
    p.add_argument("--walk-step", type=float, default=0.15, help="random-walk angular step std (rad)")
    p.add_argument("--walk-radius-step", type=float, default=0.0, help="random-walk radial step std (m)")
    p.add_argument("--alpha", type=float, default=0.5, help="alpha-beta filter position gain")
    p.add_argument("--beta", type=float, default=0.1, help="alpha-beta filter rate gain")
    p.add_argument(
        "--model", choices=["auto", "joint", "frozen"], default="auto",
        help="which localizer (see locate.py)",
    )
    p.add_argument("--out", default=None, help="write the full track (true/pred/smoothed arrays) to this .npz")
    args = p.parse_args()
    # setup() is for its platform/mesh/corpus plumbing — the trajectory
    # batch is synthesized here at exact geometry, not drawn from a dataset.
    args.dataset_size, args.val_size = 1, 0
    config, mesh, _, _ = setup(args)

    import jax
    import jax.numpy as jnp

    from acoustic_locating_vq_vae_tpu import data as D
    from acoustic_locating_vq_vae_tpu.eval import (
        alpha_beta_filter,
        arc_trajectory,
        track_metrics,
        walk_trajectory,
        wrap_angle,
    )
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    r0 = config.R if args.radius_start is None else args.radius_start
    if args.trajectory == "arc":
        theta_traj, radius_traj = arc_trajectory(
            args.windows, args.theta_start, args.theta_end, r0, args.radius_end
        )
    else:
        theta_traj, radius_traj = walk_trajectory(
            args.windows, seed=args.seed, theta_step=args.walk_step,
            radius=r0, radius_step=args.walk_radius_step,
        )
    # In-room check for the whole track (synthesize_batch only validates
    # radius_range draws; given radii are the caller's responsibility).
    max_r = D.max_source_radius(config)
    if radius_traj.max() >= max_r or radius_traj.min() <= 0:
        raise SystemExit(
            f"trajectory radius range [{radius_traj.min():.3f}, "
            f"{radius_traj.max():.3f}] leaves the room (max in-room source "
            f"radius {max_r:.3f} m around receiver {config.receiver_position[:2]})"
        )

    synth_kw = dict(getattr(args, "_synth_kwargs", {}) or {})
    synth_kw.pop("rir_bank", None)   # exact geometry — no grid snapping
    synth_kw.pop("rir_bank_radii", None)
    synth_kw.pop("radius_range", None)
    pool = getattr(args, "_speech_pool", None)
    key = jax.random.PRNGKey(args.seed)
    if pool is not None:
        key, k_pick = jax.random.split(key)
        idx = np.asarray(
            jax.random.randint(k_pick, (args.windows,), 0, pool.shape[0])
        )
        synth_kw["speech"] = jnp.asarray(np.asarray(pool)[idx])
    batch = D.synthesize_batch(
        key, args.windows, config,
        theta=jnp.asarray(wrap_angle(theta_traj)),
        radius=jnp.asarray(radius_traj),
        **synth_kw,
    )

    task, predict, predicts_radius, use_joint = build_localizer(
        args, config, StageStore(args.store_dir)
    )
    pred = predict(batch)
    theta_pred = np.asarray(task.decode_angle(jnp.asarray(pred))).reshape(-1)
    theta_smoothed = alpha_beta_filter(theta_pred, args.alpha, args.beta)
    r_pred = (
        np.asarray(task.decode_radius(jnp.asarray(pred))).reshape(-1)
        if predicts_radius
        else None
    )

    theta_true = wrap_angle(theta_traj)
    metrics = track_metrics(
        theta_true, theta_pred, theta_smoothed,
        radius_true=radius_traj, radius_pred=r_pred,
    )
    out = {
        "model": "joint" if use_joint else "frozen",
        "trajectory": args.trajectory,
        "windows": int(args.windows),
        "window_seconds": round(config.audio_samples / config.fs, 3),
        **{k: round(v, 4) for k, v in metrics.items()},
        "track": [
            {
                "theta_true_rad": round(float(t), 4),
                "theta_pred_rad": round(float(pr), 4),
                "theta_smoothed_rad": round(float(sm), 4),
                **({"radius_true_m": round(float(rt), 3),
                    "radius_pred_m": round(float(rp), 3)}
                   if r_pred is not None else {}),
            }
            for t, pr, sm, rt, rp in zip(
                theta_true, theta_pred, theta_smoothed, radius_traj,
                r_pred if r_pred is not None else radius_traj,
            )
        ],
    }
    if args.out:
        np.savez(
            args.out, theta_true=theta_true, theta_pred=theta_pred,
            theta_smoothed=theta_smoothed, radius_true=radius_traj,
            **({"radius_pred": r_pred} if r_pred is not None else {}),
        )
        out["saved"] = args.out
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

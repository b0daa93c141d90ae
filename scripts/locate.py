"""Run localization INFERENCE from a trained stage store: echoed spectrogram
in, source angle + 3-D coordinates out.

The deployment-facing end of the pipeline the reference never shipped (its
scripts stop at training/metrics). Uses the joint fine-tuned model
(stage 'location_joint') when the store has one — the best validated
localizer (VALIDATION.md) — else the frozen 'location' head over the
composite. Input comes from --data-dir (reference .pt or native .npz
datasets) or is synthesized on the fly.
"""

import json

import numpy as np

from _common import base_parser, build_localizer, setup


def main():
    p = base_parser(__doc__)
    p.add_argument("--n", type=int, default=8, help="number of samples to localize")
    p.add_argument(
        "--model", choices=["auto", "joint", "frozen"], default="auto",
        help="which localizer: the joint fine-tuned stage, the frozen "
        "location head over the composite, or auto (joint when present)",
    )
    p.add_argument(
        "--latency", type=int, default=0, metavar="K",
        help="serving benchmark: time K inference dispatches at batch --n "
        "(each on distinct data with a value-fetch barrier — the TPU tunnel "
        "memoizes identical dispatches and buffers return as futures, so "
        "naive loops under-report; see BASELINE.md) and report per-batch "
        "latency + samples/s",
    )
    args = p.parse_args()
    config, mesh, train, val = setup(args)

    import jax
    import jax.numpy as jnp

    from acoustic_locating_vq_vae_tpu.dsp import source_coordinates
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    store = StageStore(args.store_dir)
    data = val if val is not None else train
    batch = jax.tree_util.tree_map(lambda a: a[: args.n], data)
    theta_true = np.asarray(batch.theta).reshape(-1)

    task, predict, predicts_radius, use_joint = build_localizer(args, config, store)
    pred = predict(batch)

    theta_pred = np.asarray(task.decode_angle(jnp.asarray(pred))).reshape(-1)
    receiver = jnp.asarray(config.receiver_position)
    room = jnp.asarray(config.room_dimensions)
    # With a range head (predict_radius, 2-D polar localization) the
    # coordinates use the PREDICTED per-sample radius; otherwise the
    # config's fixed geometry.
    r_pred = (
        np.asarray(task.decode_radius(jnp.asarray(pred))).reshape(-1)
        if predicts_radius
        else np.full_like(theta_pred, config.R)
    )
    coords_pred = np.asarray(
        source_coordinates(
            jnp.asarray(theta_pred), receiver, room, jnp.asarray(r_pred),
            config.Z_LOC_SOURCE,
        )
    )
    ang_err = np.angle(np.exp(1j * (theta_pred - theta_true)))
    r_true = np.asarray(batch.radius).reshape(-1)

    out = {
        "model": "joint" if use_joint else "frozen",
        "samples": [
            {
                "theta_pred_rad": round(float(tp), 4),
                "coordinates_m": [round(float(c), 3) for c in cp],
                "theta_true_rad": round(float(tt), 4),
                "abs_error_rad": round(float(abs(e)), 4),
                **(
                    {"radius_pred_m": round(float(rp), 3)}
                    if predicts_radius
                    else {}
                ),
            }
            for tp, cp, tt, e, rp in zip(
                theta_pred, coords_pred, theta_true, ang_err, r_pred
            )
        ],
        "rmse_radians": round(float(np.sqrt(np.mean(ang_err**2))), 4),
    }
    if predicts_radius:
        out["rmse_radius_m"] = round(
            float(np.sqrt(np.mean((r_pred - r_true) ** 2))), 4
        )

    if args.latency > 0:
        from _common import latency_bench

        # the variant scaling also makes every dispatch distinct from the
        # accuracy dispatch above (see latency_bench for the full discipline)
        out["latency"] = latency_bench(predict, batch, args.latency, args.n)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

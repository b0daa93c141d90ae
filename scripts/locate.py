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
        import time

        # K+1 distinct inputs: scale the float leaves by a per-variant
        # factor (1e-4 relative — far above f32 ulp, so never the sub-ulp
        # "identical dispatch" trap) so the warmup and every timed dispatch
        # differ from each other AND from the accuracy dispatch above for
        # ANY K; none can be served from the tunnel's dispatch memo. (A
        # batch-axis roll is NOT enough: rolls wrap mod --n, so K >= n
        # repeats inputs.) The float() fetch is the barrier.
        def _variant(i):
            return jax.tree_util.tree_map(
                lambda a: (
                    a * np.float32(1.0 + 1e-4 * (i + 1))
                    if jnp.issubdtype(a.dtype, jnp.floating)
                    else a
                ),
                batch,
            )

        variants = [_variant(i) for i in range(args.latency + 1)]
        variants = [jax.device_put(v) for v in variants]
        for v in variants:
            jax.block_until_ready(v)
        _ = float(jnp.sum(predict(variants[-1])))  # warm (shape already compiled)
        times = []
        for v in variants[: args.latency]:
            t0 = time.perf_counter()
            _ = float(jnp.sum(predict(v)))
            times.append(time.perf_counter() - t0)
        times_ms = sorted(1e3 * t for t in times)
        out["latency"] = {
            "batch": int(args.n),
            "iters": int(args.latency),
            "mean_ms": round(float(np.mean(times_ms)), 2),
            "p50_ms": round(float(times_ms[len(times_ms) // 2]), 2),
            "min_ms": round(float(times_ms[0]), 2),
            "samples_per_s": round(args.n / float(np.mean(times)), 1),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

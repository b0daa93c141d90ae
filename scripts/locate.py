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

from _common import apply_stage_eval_config, base_parser, setup, task_kwargs


def main():
    p = base_parser(__doc__)
    p.add_argument("--n", type=int, default=8, help="number of samples to localize")
    p.add_argument(
        "--model", choices=["auto", "joint", "frozen"], default="auto",
        help="which localizer: the joint fine-tuned stage, the frozen "
        "location head over the composite, or auto (joint when present)",
    )
    args = p.parse_args()
    config, mesh, train, val = setup(args)

    import jax
    import jax.numpy as jnp

    from acoustic_locating_vq_vae_tpu.dsp import source_coordinates
    from acoustic_locating_vq_vae_tpu.train import JointLocationTask, LocationTask
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    store = StageStore(args.store_dir)
    use_joint = args.model == "joint" or (
        args.model == "auto" and store.has_stage("location_joint")
    )

    data = val if val is not None else train
    batch = jax.tree_util.tree_map(lambda a: a[: args.n], data)
    theta_true = np.asarray(batch.theta).reshape(-1)

    kw = task_kwargs(args, config, location=True)
    if use_joint:
        if not store.has_stage("location_joint"):
            raise SystemExit("no 'location_joint' stage in the store (run train_location.py --joint)")
        params = store.load_stage("location_joint")["params"]
        kw.pop("input_mode", None)  # the joint model always uses dense latents
        apply_stage_eval_config(
            kw, store, "location_joint", head_params=params["head"],
            keys=("compat_vq_flatten", "target_mode", "predict_radius"),
            flatten_default="vectors",
        )
        task = JointLocationTask(**kw)
        model = task.build_model()
        (x_trans,) = task.model_inputs(batch)
        pred, _, _ = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x_trans)
    else:
        if not store.has_stage("location"):
            raise SystemExit("no 'location' stage in the store (run train_location.py)")
        params = store.load_stage("location")["params"]
        stage = "finetune" if store.has_stage("finetune") else "echoed"
        composite_params = store.load_stage(stage)["params"]
        apply_stage_eval_config(
            kw, store, "location", head_params=params, probe_task=LocationTask(**kw)
        )
        task = LocationTask(**kw)
        composite = task.build_composite()
        model = task.build_model()

        @jax.jit
        def _predict(loc_p, comp_p, b):
            feats = task.encodings_from_composite(composite, comp_p, b)
            return model.apply({"params": loc_p}, feats)

        pred = _predict(params, composite_params, batch)

    theta_pred = np.asarray(task.decode_angle(jnp.asarray(pred))).reshape(-1)
    receiver = jnp.asarray(config.receiver_position)
    room = jnp.asarray(config.room_dimensions)
    # With a range head (predict_radius, 2-D polar localization) the
    # coordinates use the PREDICTED per-sample radius; otherwise the
    # config's fixed geometry.
    predicts_radius = getattr(task, "predict_radius", False)
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
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

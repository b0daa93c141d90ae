"""Compare location models (fixed implementation of the reference's broken
scripts/compare_location_models.py — C21): evaluate the trained location MLP
against one or more composites on a held-out set, reporting theta and 3-D
coordinate RMSE."""

import json

from _common import apply_stage_eval_config, base_parser, setup, task_kwargs


def main():
    p = base_parser(__doc__)
    p.add_argument(
        "--stages", nargs="*", default=None,
        help="composite stage names to compare (default: every stage with a location model context)",
    )
    args = p.parse_args()
    config, mesh, train, val = setup(args)
    eval_data = val if val is not None else train

    from acoustic_locating_vq_vae_tpu.eval import compare_location_models
    from acoustic_locating_vq_vae_tpu.train import LocationTask
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    store = StageStore(args.store_dir)
    if not store.has_stage("location"):
        raise SystemExit("no 'location' stage in the store; run train_location.py first")
    loc_params = store.load_stage("location")["params"]

    stages = args.stages or [s for s in ("echoed", "finetune") if store.has_stage(s)]
    # The checkpoint is authoritative for the trained modes (stage metadata,
    # with shape inference as the fallback for older stores) — the shipped
    # pipeline preset trains quantized/theta-pi, the reference-compat path
    # trains encodings; both must evaluate without restating training flags.
    kw = task_kwargs(args, config, location=True)
    apply_stage_eval_config(
        kw, store, "location", head_params=loc_params, probe_task=LocationTask(**kw)
    )
    task = LocationTask(**kw)
    entries = {
        s: {
            "location_params": loc_params,
            "composite_params": store.load_stage(s)["params"],
            "task": task,
        }
        for s in stages
    }
    results = compare_location_models(entries, eval_data)

    # Beyond-parity: when the store has the joint fine-tuned stage 6, include
    # it in the comparison (the configuration VALIDATION.md shows beating the
    # frozen designs by two orders of magnitude).
    if store.has_stage("location_joint"):
        from acoustic_locating_vq_vae_tpu.eval import evaluate_joint_location
        from acoustic_locating_vq_vae_tpu.train import JointLocationTask

        jp = store.load_stage("location_joint")["params"]
        jkw = task_kwargs(args, config, location=True)
        jkw.pop("input_mode", None)  # the joint model always uses dense latents
        apply_stage_eval_config(
            jkw, store, "location_joint", head_params=jp["head"],
            keys=("compat_vq_flatten", "target_mode", "predict_radius"),
            flatten_default="vectors",
        )
        results["location_joint"] = evaluate_joint_location(
            JointLocationTask(**jkw), jp, eval_data
        )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

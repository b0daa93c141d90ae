"""Compare location models (fixed implementation of the reference's broken
scripts/compare_location_models.py — C21): evaluate the trained location MLP
against one or more composites on a held-out set, reporting theta and 3-D
coordinate RMSE."""

import json

from _common import base_parser, setup, task_kwargs


def main():
    p = base_parser(__doc__)
    p.add_argument(
        "--stages", nargs="*", default=None,
        help="composite stage names to compare (default: every stage with a location model context)",
    )
    args = p.parse_args()
    config, mesh, train, val = setup(args)
    eval_data = val if val is not None else train

    from acoustic_locating_vq_vae_tpu.eval import (
        compare_location_models,
        infer_location_modes,
    )
    from acoustic_locating_vq_vae_tpu.train import LocationTask
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    store = StageStore(args.store_dir)
    if not store.has_stage("location"):
        raise SystemExit("no 'location' stage in the store; run train_location.py first")
    loc_params = store.load_stage("location")["params"]

    stages = args.stages or [s for s in ("echoed", "finetune") if store.has_stage(s)]
    kw = task_kwargs(args, config, location=True)
    # Self-configure from the checkpoint unless flags say otherwise (the
    # shipped pipeline preset trains quantized/theta-pi; the reference-compat
    # path trains encodings — both must evaluate without the user restating
    # the training flags).
    inferred = infer_location_modes(loc_params, LocationTask(**kw))
    kw.setdefault("input_mode", inferred["input_mode"])
    kw.setdefault("target_mode", inferred["target_mode"])
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
        # infer the trained target mode from the head: fc_5 emits 2 values
        # for the circular (sin, cos) target, 1 for theta/pi
        out_dim = jp["head"]["fc_5"]["Dense_0"]["kernel"].shape[-1]
        kw = task_kwargs(args, config, location=True)
        kw.pop("input_mode", None)
        kw.setdefault("target_mode", "sincos" if out_dim == 2 else "normalized_angle")
        results["location_joint"] = evaluate_joint_location(
            JointLocationTask(**kw), jp, eval_data
        )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

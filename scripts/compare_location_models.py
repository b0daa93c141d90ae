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

    from acoustic_locating_vq_vae_tpu.eval import compare_location_models
    from acoustic_locating_vq_vae_tpu.train import LocationTask
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    store = StageStore(args.store_dir)
    if not store.has_stage("location"):
        raise SystemExit("no 'location' stage in the store; run train_location.py first")
    loc_params = store.load_stage("location")["params"]

    stages = args.stages or [s for s in ("echoed", "finetune") if store.has_stage(s)]
    task = LocationTask(**task_kwargs(args, config, location=True))
    entries = {
        s: {
            "location_params": loc_params,
            "composite_params": store.load_stage(s)["params"],
            "task": task,
        }
        for s in stages
    }
    results = compare_location_models(entries, eval_data)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

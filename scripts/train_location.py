"""Train the location regressor (stage 5) — reference scripts/train_location.py:
MLP over frozen RIR-branch VQ encodings predicting theta/pi."""

from _common import base_parser, final_metric, recipe_kwargs, setup, task_kwargs, trainer_kwargs


def main():
    p = base_parser(__doc__)
    p.add_argument(
        "--composite-stage", default=None,
        help="stage name of the composite to read latents from (default: finetune if present, else echoed)",
    )
    p.add_argument(
        "--joint", action="store_true",
        help="beyond-parity variant: fine-tune the RIR encoder JOINTLY with "
        "the location head on the angle loss (gradients through the VQ "
        "straight-through estimator; codebook frozen). The reference freezes "
        "the whole composite.",
    )
    p.add_argument("--commitment-weight", type=float, default=0.25,
                   help="(--joint) encoder-to-codebook anchor weight")
    p.add_argument(
        "--predict-radius", action="store_true",
        help="(--joint) append a range output to the head and supervise it "
        "with the per-sample source radius — 2-D polar localization "
        "(angle + distance). Meaningful with --radius-range data; the "
        "reference's design is angle-only.",
    )
    p.add_argument("--radius-weight", type=float, default=1.0,
                   help="(--predict-radius) weight of the range MSE term")
    p.add_argument(
        "--tail-weight", type=float, default=0.0,
        help="(--joint) hard-example weighting: add this x the mean of the "
        "worst ceil(tail-frac x batch) per-sample angle errors to the loss — "
        "targets the far-range outlier tail the uniform mean ignores "
        "(VALIDATION.md run E: 0.25-10.5%% of draws >0.1 rad while medians "
        "sat at 0.02-0.033). 0 = the validated runs C-I objective",
    )
    p.add_argument("--tail-frac", type=float, default=0.125,
                   help="(--tail-weight) worst fraction of the batch to weight")
    args = p.parse_args()
    from acoustic_locating_vq_vae_tpu.train import LocationTask as _T

    config, mesh, train, val = setup(args, resident_fields=_T().resident_fields)

    import jax

    from acoustic_locating_vq_vae_tpu.train import LocationTask, Trainer
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    store = StageStore(args.store_dir)
    stage = args.composite_stage or ("finetune" if store.has_stage("finetune") else "echoed")
    composite_params = store.load_stage(stage)["params"]
    print(f"using composite from stage {stage!r}")

    from acoustic_locating_vq_vae_tpu.train import check_flatten_handoff

    if args.joint:
        from acoustic_locating_vq_vae_tpu.train import JointLocationTask

        kw = task_kwargs(args, config, location=True)
        kw.pop("input_mode", None)  # joint always uses dense latents
        task = JointLocationTask(
            **kw, commitment_weight=args.commitment_weight,
            predict_radius=args.predict_radius, radius_weight=args.radius_weight,
            tail_weight=args.tail_weight, tail_frac=args.tail_frac,
        )
        check_flatten_handoff(store.stage_metadata(stage), task, stage)
        rk = recipe_kwargs(args)
        if rk:
            # One-command run-H recipe: bank pretraining + exact polish.
            from acoustic_locating_vq_vae_tpu.train import fit_joint_recipe

            state, history = fit_joint_recipe(
                task, jax.random.PRNGKey(args.seed + 5), train, val,
                args.store_dir, mesh, composite_params,
                bank_updates=rk["bank_updates"], num_updates=args.updates,
                exact_synth_kwargs=rk["exact_synth_kwargs"],
                polish_bank_prob=rk["polish_bank_prob"],
                resume=args.resume, **trainer_kwargs(args),
            )
        else:
            trainer = Trainer(
                task, mesh=mesh, checkpoint_dir=args.store_dir, **trainer_kwargs(args)
            )
            state = trainer.init_state(jax.random.PRNGKey(args.seed + 5), train)
            seeded = task.seed_params(state.params, composite_params)
            state = state.replace(params=seeded, opt_state=trainer.optimizer.init(seeded))
            state, history = trainer.fit(
                state, train, val, num_updates=args.updates, resume=args.resume
            )
    else:
        if recipe_kwargs(args):
            raise SystemExit("--bank-pretrain-updates is a --joint recipe")
        task = LocationTask(**task_kwargs(args, config, location=True))
        check_flatten_handoff(store.stage_metadata(stage), task, stage)
        trainer = Trainer(
            task, mesh=mesh, checkpoint_dir=args.store_dir,
            composite_params=composite_params, **trainer_kwargs(args),
        )
        state = trainer.init_state(jax.random.PRNGKey(args.seed + 5), train)
        state, history = trainer.fit(state, train, val, num_updates=args.updates, resume=args.resume)
    f = history.finalize()
    tgt = "(sin,cos)" if getattr(task, "target_mode", "") == "sincos" else "theta/pi"
    final_mse = final_metric(f, "location_error")
    if final_mse is None:
        print(f"stage {task.name!r} already at/past {args.updates} updates; nothing to train (--resume)")
    else:
        print(
            f"done: final location MSE {final_mse:.5f} "
            f"(target {tgt}); stage {task.name!r} saved to {args.store_dir}"
        )
    if not args.joint and final_mse is not None and final_mse > 0.15:
        # The frozen stage plateaus at the trivial predictor (theta/pi MSE
        # ~1/3 = uniform-angle variance) in EVERY run — expected, not a
        # failure (VERDICT r4 weak #7; VALIDATION.md runs A/B).
        print(
            "note: a frozen-stage MSE near 0.33 (median ~1.5 rad) is the "
            "EXPECTED stall of the reference's frozen-composite design "
            "(VALIDATION.md runs A/B) — the shipped localizer is the joint "
            "stage: rerun with --joint (or run_pipeline.py --joint-location)."
        )
    if args.joint and (val is not None or train is not None):
        import json

        from acoustic_locating_vq_vae_tpu.eval import evaluate_joint_location

        metrics = evaluate_joint_location(task, state.params, val if val is not None else train)
        print("joint location evaluation:", json.dumps(metrics, indent=2))


if __name__ == "__main__":
    from _common import exit_on_preemption

    with exit_on_preemption():
        main()

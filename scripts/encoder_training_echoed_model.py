"""Fine-tune the composite's encoders (stage 4) — reference
scripts/encoder_training_echoed_model.py: reload the echoed composite,
unfreeze encoders (codebooks stay frozen), lr=1e-5, 5000 updates."""

from _common import base_parser, final_metric, setup, task_kwargs, trainer_kwargs


def main():
    p = base_parser(__doc__)
    p.add_argument(
        "--commitment-weight", type=float, default=0.0,
        help="anchor unfrozen encoders to the frozen codebooks (0.0 = reference "
        "parity, which collapses the codebooks — see VALIDATION.md; 0.25 recommended)",
    )
    args = p.parse_args()
    from acoustic_locating_vq_vae_tpu.train import EncoderFinetuneTask as _T

    config, mesh, train, val = setup(args, resident_fields=_T().resident_fields)

    import jax

    from acoustic_locating_vq_vae_tpu.train import (
        EncoderFinetuneTask,
        Trainer,
        check_flatten_handoff,
    )
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    store = StageStore(args.store_dir)
    task = EncoderFinetuneTask(
        **task_kwargs(args, config, supports_seq=True), commitment_weight=args.commitment_weight
    )
    trainer = Trainer(task, mesh=mesh, checkpoint_dir=args.store_dir, **trainer_kwargs(args))
    state = trainer.init_state(jax.random.PRNGKey(args.seed + 4), train)

    if store.has_stage("echoed"):
        check_flatten_handoff(store.stage_metadata("echoed"), task, "echoed")
        params = store.load_stage("echoed")["params"]
        state = state.replace(params=params, opt_state=trainer.optimizer.init(params))
    else:
        print("WARNING: no 'echoed' stage in store; fine-tuning a fresh composite")

    state, history = trainer.fit(state, train, val, num_updates=args.updates, resume=args.resume)
    f = history.finalize()
    recon = final_metric(f, "recon_error")
    if recon is None:
        print(f"stage 'finetune' already at/past {args.updates} updates; nothing to train (--resume)")
    else:
        print(f"done: final recon_error {recon:.4f}; stage 'finetune' saved to {args.store_dir}")


if __name__ == "__main__":
    from _common import exit_on_preemption

    with exit_on_preemption():
        main()

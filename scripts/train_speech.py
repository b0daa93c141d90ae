"""Train the speech VQ-VAE (stage 1) — reference scripts/train_speech.py."""

from _common import base_parser, final_metric, setup, task_kwargs, trainer_kwargs


def main():
    args = base_parser(__doc__).parse_args()
    from acoustic_locating_vq_vae_tpu.train import SpeechVQVAETask as _T

    config, mesh, train, val = setup(args, resident_fields=_T().resident_fields)

    import jax

    from acoustic_locating_vq_vae_tpu.train import SpeechVQVAETask, Trainer

    task = SpeechVQVAETask(**task_kwargs(args, config, supports_ema=True, supports_seq=True))
    trainer = Trainer(task, mesh=mesh, checkpoint_dir=args.store_dir, **trainer_kwargs(args))
    state = trainer.init_state(jax.random.PRNGKey(args.seed + 1), train)
    state, history = trainer.fit(state, train, val, num_updates=args.updates, resume=args.resume)
    f = history.finalize()
    recon = final_metric(f, "recon_error")
    if recon is None:
        print(f"stage 'speech' already at/past {args.updates} updates; nothing to train (--resume)")
    else:
        print(
            f"done: final recon_error {recon:.4f}, "
            f"perplexity {final_metric(f, 'perplexity'):.1f}; "
            f"stage 'speech' saved to {args.store_dir}"
        )


if __name__ == "__main__":
    from _common import exit_on_preemption

    with exit_on_preemption():
        main()

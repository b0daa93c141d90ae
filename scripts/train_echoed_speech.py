"""Train the echoed-speech composite decoder (stage 3) — reference
scripts/train_echoed_speech.py. Grafts the pretrained 'speech' and 'rir'
stage parameters from the store (the reference's pickle loading,
train_echoed_speech.py:18-19)."""

from _common import base_parser, final_metric, setup, task_kwargs, trainer_kwargs


def main():
    args = base_parser(__doc__).parse_args()
    from acoustic_locating_vq_vae_tpu.train import EchoedSpeechTask as _T

    config, mesh, train, val = setup(args, resident_fields=_T().resident_fields)

    import jax

    from acoustic_locating_vq_vae_tpu.train import (
        EchoedSpeechTask,
        Trainer,
        check_flatten_handoff,
        graft_pretrained,
    )
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    store = StageStore(args.store_dir)
    task = EchoedSpeechTask(**task_kwargs(args, config, supports_seq=True))
    trainer = Trainer(task, mesh=mesh, checkpoint_dir=args.store_dir, **trainer_kwargs(args))
    state = trainer.init_state(jax.random.PRNGKey(args.seed + 3), train)

    speech_p = store.load_stage("speech")["params"] if store.has_stage("speech") else None
    rir_p = store.load_stage("rir")["params"] if store.has_stage("rir") else None
    if speech_p is None or rir_p is None:
        print("WARNING: missing pretrained speech/rir stage in store; using fresh init")
    for donor, params in (("speech", speech_p), ("rir", rir_p)):
        if params is not None:
            check_flatten_handoff(store.stage_metadata(donor), task, donor)
    grafted = graft_pretrained(state.params, speech_params=speech_p, rir_params=rir_p)
    state = state.replace(params=grafted, opt_state=trainer.optimizer.init(grafted))

    state, history = trainer.fit(state, train, val, num_updates=args.updates, resume=args.resume)
    f = history.finalize()
    recon = final_metric(f, "recon_error")
    if recon is None:
        print(f"stage 'echoed' already at/past {args.updates} updates; nothing to train (--resume)")
    else:
        print(f"done: final recon_error {recon:.4f}; stage 'echoed' saved to {args.store_dir}")


if __name__ == "__main__":
    from _common import exit_on_preemption

    with exit_on_preemption():
        main()

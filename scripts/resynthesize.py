"""Audio resynthesis check (C24: sout_test.py / sound_from_datapoint.ipynb as
a working CLI): take a dataset sample, optionally reconstruct it with the
trained speech VQ-VAE, and write Griffin-Lim audio + spectral SNR."""

import numpy as np

from _common import base_parser, setup, task_kwargs


def main():
    p = base_parser(__doc__)
    p.add_argument("--out-prefix", default="resynth")
    p.add_argument("--index", type=int, default=0, help="dataset sample index")
    p.add_argument("--gl-iters", type=int, default=32)
    args = p.parse_args()
    config, mesh, train, val = setup(args)

    import jax
    import jax.numpy as jnp

    from acoustic_locating_vq_vae_tpu.dsp import znorm
    from acoustic_locating_vq_vae_tpu.eval import (
        audio_from_power_spec,
        spectral_snr_db,
        write_wav,
    )
    from acoustic_locating_vq_vae_tpu.train import SpeechVQVAETask, Trainer
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    spec = train.speech_spec[args.index]  # (F, T) power
    key = jax.random.PRNGKey(args.seed)
    audio = audio_from_power_spec(spec, key, config, n_iter=args.gl_iters)
    write_wav(f"{args.out_prefix}_original.wav", np.asarray(audio), config.fs)
    print(f"wrote {args.out_prefix}_original.wav (Griffin-Lim, {args.gl_iters} iters)")

    store = StageStore(args.store_dir)
    if store.has_stage("speech"):
        task = SpeechVQVAETask(**task_kwargs(args, config, supports_ema=True))
        trainer = Trainer(task, mesh=mesh, verbose=False)
        state = trainer.init_state(jax.random.PRNGKey(1), train)
        params = store.load_stage("speech")["params"]
        x = znorm(jnp.abs(train.speech_spec[args.index : args.index + 1]), axis=1)
        _, recon, perp = trainer.model.apply({"params": params}, x, train=False)
        # undo the z-norm for listening: rescale by the original stats
        orig = jnp.abs(train.speech_spec[args.index : args.index + 1])
        mean = jnp.mean(orig, axis=1, keepdims=True)
        std = jnp.std(orig, axis=1, keepdims=True, ddof=1) + 1e-8
        recon_power = jnp.maximum(recon * std + mean, 0.0)[0]
        snr = float(spectral_snr_db(spec, recon_power))
        audio_r = audio_from_power_spec(recon_power, key, config, n_iter=args.gl_iters)
        write_wav(f"{args.out_prefix}_recon.wav", np.asarray(audio_r), config.fs)
        print(
            f"wrote {args.out_prefix}_recon.wav (model recon, perplexity {float(perp):.1f}, "
            f"spectral SNR {snr:.1f} dB)"
        )
    else:
        print("(no trained 'speech' stage in the store; wrote original only)")


if __name__ == "__main__":
    main()

"""Standalone RIR demo — reference scratch_scripts/Impulse_Response.py (C25):
generate a room impulse response, convolve a waveform through it, and write
plots + audio. Uses the on-device XLA path (add --native for the C++ one)."""

import numpy as np

from _common import base_parser


def main():
    p = base_parser(__doc__)
    p.add_argument("--out-prefix", default="impulse_demo")
    p.add_argument("--native", action="store_true", help="use the C++ ISM library")
    p.add_argument("--theta", type=float, default=0.7)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from acoustic_locating_vq_vae_tpu import dsp
    from acoustic_locating_vq_vae_tpu.data import DatasetConfig, synthetic_speech_batch
    from acoustic_locating_vq_vae_tpu.eval import write_wav

    cfg = DatasetConfig()
    recv = jnp.asarray(cfg.receiver_position)
    src = dsp.source_coordinates(
        jnp.asarray(args.theta), recv, jnp.asarray(cfg.room_dimensions), cfg.R, cfg.Z_LOC_SOURCE
    )
    print(f"theta={args.theta:.3f} -> source {np.asarray(src).round(3).tolist()}")

    if args.native:
        from acoustic_locating_vq_vae_tpu import native

        h = jnp.asarray(
            native.generate_rir_native(
                np.asarray(src), cfg.receiver_position, cfg.room_dimensions,
                cfg.n_sample, cfg.fs, rt60=cfg.reverberation_time,
            ),
            jnp.float32,
        )
    else:
        h = dsp.generate_rir(
            src, recv, room=tuple(cfg.room_dimensions), nsample=cfg.n_sample,
            fs=float(cfg.fs), rt60=cfg.reverberation_time,
        )

    wave = synthetic_speech_batch(jax.random.PRNGKey(args.seed), 1, cfg.audio_samples, cfg.fs)[0]
    echoed = dsp.fft_convolve(wave, h, mode="same")

    write_wav(f"{args.out_prefix}_dry.wav", np.asarray(wave), cfg.fs)
    write_wav(f"{args.out_prefix}_echoed.wav", np.asarray(echoed), cfg.fs)
    np.save(f"{args.out_prefix}_rir.npy", np.asarray(h))
    print(f"wrote {args.out_prefix}_dry.wav / _echoed.wav / _rir.npy")

    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        from acoustic_locating_vq_vae_tpu.utils import plot_spectrogram

        fig, axes = plt.subplots(3, 1, figsize=(8, 9))
        axes[0].plot(np.asarray(h))
        axes[0].set_title("room impulse response")
        plot_spectrogram(
            np.asarray(dsp.spectrogram(wave, cfg.NFFT, cfg.HOP_LENGTH, power=2.0)),
            title="dry speech", ax=axes[1],
        )
        plot_spectrogram(
            np.asarray(dsp.spectrogram(echoed, cfg.NFFT, cfg.HOP_LENGTH, power=2.0)),
            title="echoed speech", ax=axes[2],
        )
        fig.tight_layout()
        fig.savefig(f"{args.out_prefix}.png", dpi=110)
        print(f"wrote {args.out_prefix}.png")
    except Exception as e:
        print(f"(no plot: {e})")


if __name__ == "__main__":
    main()

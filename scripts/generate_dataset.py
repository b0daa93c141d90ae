"""Generate a synthetic RIR/speech spectrogram dataset on device and write it
to disk — the TPU-native replacement for the reference's serial CPU generator
``scripts/genereate_dataset.py`` (filename typo fixed; README.md:23 already
calls it generate_rir_dataset.py).

Writes either the framework's native .npz files or the reference's exact
.pt pickle format (--format pt) so reference code can consume the output.
"""

from __future__ import annotations

import time

from _common import base_parser


def main():
    p = base_parser(__doc__)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--format", choices=["npz", "pt"], default="npz")
    p.add_argument("--fixed-rir", action="store_true", help="ablation: constant RIR (genereate_dataset.py:12-16)")
    p.add_argument("--fixed-speech", action="store_true", help="ablation: constant utterance")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from acoustic_locating_vq_vae_tpu import data as D

    config = (
        D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
        if args.smoke
        else D.DatasetConfig()
    )
    size = min(args.dataset_size, 64) if args.smoke else args.dataset_size

    pool = None
    if args.wav_dir:
        from acoustic_locating_vq_vae_tpu.data.speech import load_wav_dir

        pool = load_wav_dir(args.wav_dir, config.audio_samples)
        print(f"speech corpus: {pool.shape[0]} wavs from {args.wav_dir}")

    t0 = time.time()
    batch = D.make_dataset(
        jax.random.PRNGKey(args.seed), size, config,
        fixed_rir=args.fixed_rir, fixed_speech=args.fixed_speech, speech_pool=pool,
    )
    jax.block_until_ready(batch.speech_spec)
    dt = time.time() - t0
    print(f"synthesized {size} samples in {dt:.2f}s ({size / dt:.1f} samples/s)")

    if args.format == "pt":
        D.save_dataset_reference_format(args.out_dir, batch, config)
    else:
        D.save_dataset(args.out_dir, batch, config)
    print(f"wrote {size} samples + dataset_config.npy to {args.out_dir}")


if __name__ == "__main__":
    main()

"""t-SNE latent analysis — reference scripts/echoe_transfer.py (C23): embed
the RIR-branch VQ encodings of a trained composite in 2-D and check they
organize by source angle. Writes the embedding + angles to an .npz (and a
PNG when matplotlib is available) instead of blocking on plt.show()."""

import numpy as np

from _common import apply_stage_eval_config, base_parser, setup, task_kwargs


def main():
    p = base_parser(__doc__)
    p.add_argument("--out", default="tsne_rir.npz")
    p.add_argument("--stage", default=None, help="composite stage (default finetune|echoed)")
    p.add_argument(
        "--probe", action="store_true",
        help="also run the ridge linear probe (eval.linear_angle_probe) on "
        "the RIR-branch quantized latents — how much angle is LINEARLY "
        "decodable (the VALIDATION.md round-2 latent-study statistic)",
    )
    args = p.parse_args()
    config, mesh, train, val = setup(args)
    data = val if val is not None else train

    from acoustic_locating_vq_vae_tpu.eval import linear_angle_probe, tsne_rir_embedding
    from acoustic_locating_vq_vae_tpu.train import LocationTask
    from acoustic_locating_vq_vae_tpu.utils import StageStore

    store = StageStore(args.store_dir)
    stage = args.stage or ("finetune" if store.has_stage("finetune") else "echoed")
    composite_params = store.load_stage(stage)["params"]

    # The VQ flatten mode the composite was trained with (stage metadata)
    # determines its code assignments; shape inference can't see it.
    kw = task_kwargs(args, config, location=True)
    apply_stage_eval_config(kw, store, stage, keys=("compat_vq_flatten",))
    task = LocationTask(**kw)
    emb, theta = tsne_rir_embedding(task, composite_params, data)
    np.savez(args.out, embedding=emb, theta=theta)
    print(f"t-SNE of {emb.shape[0]} RIR encodings written to {args.out}")

    if args.probe:
        import dataclasses
        import jax

        qtask = dataclasses.replace(task, input_mode="quantized")
        composite = qtask.build_composite()
        encode = jax.jit(
            lambda p, b: qtask.encodings_from_composite(composite, p, b)
        )
        n = int(data.speech_spec.shape[0])
        chunks = []
        for i in range(0, n, 64):  # chunked like eval/compare.py — the full
            # set in one dispatch would materialize every activation at once
            sub = jax.tree_util.tree_map(lambda a: a[i : i + 64], data)
            chunks.append(np.asarray(encode(composite_params, sub)))
        feats = np.concatenate(chunks, axis=0)
        split = max(1, int(0.8 * n))
        if n - split < 2:
            print(f"(probe skipped: {n} samples leave no test split)")
        else:
            m = linear_angle_probe(
                feats[:split], theta[:split], feats[split:], theta[split:]
            )
            print(
                f"linear angle probe ({stage}, {split}/{n - split} train/test): "
                f"R^2 {m['r2']:.3f}, angle RMSE {m['angle_rmse_radians']:.3f} rad"
            )

    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        fig, ax = plt.subplots()
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=theta, cmap="hsv", s=8)
        fig.colorbar(sc, label="theta [rad]")
        ax.set_title(f"t-SNE of RIR VQ encodings ({stage})")
        png = args.out.rsplit(".", 1)[0] + ".png"
        fig.savefig(png, dpi=120)
        print(f"plot written to {png}")
    except Exception as e:  # matplotlib optional
        print(f"(no plot: {e})")


if __name__ == "__main__":
    main()

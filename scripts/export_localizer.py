"""Export a trained localizer from a stage store as a self-contained AOT
serving artifact (StableHLO via jax.export): echoed power spectrogram in,
(angle, radius, 3-D coordinates) out, weights embedded, symbolic batch
dimension — then reload it and verify against the live model on fresh
synthesized data.

Deployment counterpart the reference never shipped (its artifacts are
whole-module torch pickles, compare_location_models.py:36-41, which need
the original class code to unpickle); the exported program needs only jax.
"""

import json

import numpy as np

from _common import base_parser, setup


def main():
    p = base_parser(__doc__)
    p.add_argument("--out-dir", required=True, help="artifact output directory")
    p.add_argument(
        "--model", choices=["auto", "joint", "frozen"], default="auto",
        help="which localizer stage to export (auto = joint when present)",
    )
    p.add_argument(
        "--export-batch", type=int, default=None,
        help="pin the exported batch size (default: symbolic — one artifact "
        "serves any batch size)",
    )
    p.add_argument(
        "--export-platforms", nargs="+", default=["tpu", "cpu"],
        help="backends to lower for (cross-lowering needs no physical "
        "device: a CPU host can produce a TPU artifact)",
    )
    p.add_argument(
        "--verify-n", type=int, default=8,
        help="synthesized samples for the reload-and-compare check",
    )
    p.add_argument(
        "--from-audio", action="store_true",
        help="fuse the STFT frontend into the artifact: input becomes the "
        "raw echoed waveform (B, config.audio_samples) instead of a power "
        "spectrogram — one program from microphone samples to coordinates",
    )
    p.add_argument(
        "--latency", type=int, default=0, metavar="K",
        help="serving benchmark on the DESERIALIZED artifact: time K "
        "dispatches at batch --verify-n (distinct scaled inputs + "
        "value-fetch barriers — the TPU tunnel memoizes identical "
        "dispatches; the shared _common.latency_bench locate.py also uses)",
    )
    args = p.parse_args()
    args.val_size = 0
    args.dataset_size = max(2, args.verify_n)
    # The tiny verify batch must be a plain f32-resident SampleBatch: the
    # exported artifact's input is declared float32, and a HostStagedDataset
    # isn't sliceable — both flags are dataset-scale knobs meaningless here.
    if getattr(args, "dataset_bf16", False) or getattr(args, "host_staged", 0):
        print("note: --dataset-bf16/--host-staged ignored for the export's "
              "verify batch", flush=True)
        args.dataset_bf16 = False
        args.host_staged = 0
    config, mesh, train, _ = setup(args)

    import jax

    from acoustic_locating_vq_vae_tpu.eval import export_localizer, load_localizer
    from acoustic_locating_vq_vae_tpu.train import Trainer  # noqa: F401 (store deps)
    from acoustic_locating_vq_vae_tpu.utils import StageStore
    from _common import load_localizer_stages

    store = StageStore(args.store_dir)
    task, params, composite_params, use_joint = load_localizer_stages(
        args, config, store
    )
    from acoustic_locating_vq_vae_tpu.eval.serving import (
        make_serving_fn,
        params_fingerprint,
        store_provenance,
        update_sidecar,
    )

    # one closure, serialized AND compared against — they can't diverge
    serve, _ = make_serving_fn(
        task, params, composite_params, use_joint, config,
        from_audio=args.from_audio,
    )
    # Self-describing artifact (VERDICT r3 next #8): store fingerprint,
    # stage manifest, and the export-time task modes ride in the sidecar.
    stage = "location_joint" if use_joint else "location"
    prov = store_provenance(store, stage, params, task=task)
    if not use_joint:
        comp_stage = "finetune" if store.has_stage("finetune") else "echoed"
        prov["composite_stage"] = comp_stage
        prov["composite_params_sha256"] = params_fingerprint(composite_params)
    meta = export_localizer(
        task, params, composite_params, use_joint, config, args.out_dir,
        batch_size=args.export_batch, platforms=tuple(args.export_platforms),
        serve_fn=serve, from_audio=args.from_audio, provenance=prov,
    )
    print(f"exported {meta['model']} localizer -> {args.out_dir} "
          f"({meta['bytes']} bytes, platforms {meta['platforms']})", flush=True)

    # Reload the artifact cold and compare against the live model.
    call, meta2 = load_localizer(args.out_dir)
    batch = jax.tree_util.tree_map(lambda a: a[: args.verify_n], train)
    if args.from_audio:
        # the dataset stores spectrograms, not waveforms — program equality
        # (artifact vs live closure, shared STFT frontend) is checked on
        # reproducible surrogate waveforms at the declared input shape
        spec = np.asarray(
            np.random.default_rng(args.seed).standard_normal(
                (args.verify_n, config.audio_samples)
            ),
            np.float32,
        )
    else:
        spec = batch.echoed_spec
    live = [np.asarray(x) for x in jax.jit(serve)(spec)]
    art = [np.asarray(x) for x in call(spec)]
    diffs = [float(np.max(np.abs(a - b))) for a, b in zip(live, art)]
    names = meta2["outputs"]
    ok = all(d < 1e-4 for d in diffs)
    out = {
        "verified": ok,
        "max_abs_diff": dict(zip(names, diffs)),
        "theta_pred_rad": [round(float(t), 4) for t in art[0]],
    }

    if args.latency > 0:
        from _common import latency_bench

        out["artifact_latency"] = latency_bench(
            call, spec, args.latency, int(spec.shape[0])
        )

    # The eval summary becomes part of the artifact's own record, so a
    # deployed copy carries its verification evidence with it.
    update_sidecar(args.out_dir, eval_summary=out)
    print(json.dumps(out))
    if not ok:
        raise SystemExit("artifact output diverges from the live model")


if __name__ == "__main__":
    main()

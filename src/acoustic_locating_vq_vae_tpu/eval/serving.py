"""AOT serving export: the trained localizer as ONE serialized program.

``export_localizer`` lowers the full inference path — echoed POWER
spectrogram in, (angle, source radius, 3-D coordinates) out, weights
embedded as constants — through :func:`jax.export.export` and writes the
StableHLO artifact plus a JSON sidecar. ``load_localizer`` restores a
callable from the artifact alone: deployment needs NO model classes, task
objects, or checkpoint store — just jax. The batch dimension is exported
symbolically by default, so one artifact serves any batch size.

Reference counterpart: none — the reference stops at training scripts and
whole-module torch pickles (compare_location_models.py:36-41), which
require the original class code at unpickle time and a torch runtime.
This is the TPU-native deployment story: a compiler-level artifact
(StableHLO) that runs on any platform it was lowered for (tpu + cpu by
default) with jax's forward-compatibility guarantees.
"""

from __future__ import annotations

import json
import os
from types import SimpleNamespace
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..data.synth import observed_power_spec
from ..dsp import source_coordinates

__all__ = [
    "make_serving_fn",
    "export_localizer",
    "load_localizer",
    "params_fingerprint",
    "store_provenance",
    "update_sidecar",
]

SERVING_BLOB = "localizer.stablehlo"
SERVING_META = "serving.json"


def params_fingerprint(tree) -> str:
    """Deterministic sha256 over a parameter pytree: every leaf's tree path,
    shape, dtype, and raw bytes feed the hash, so two artifacts carry the
    same fingerprint iff they embed bit-identical weights in the same
    structure. Used to tie a serving artifact back to the exact training
    checkpoint it was exported from (VERDICT r3 next #8)."""
    import hashlib

    import numpy as np

    h = hashlib.sha256()
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in sorted(leaves, key=lambda kv: jax.tree_util.keystr(kv[0])):
        a = np.asarray(jax.device_get(leaf))
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def store_provenance(store, stage: str, params, task=None) -> dict:
    """Self-describing training provenance for a serving artifact: the
    source store path, stage name, the stage's manifest entry (step, save
    sequence, task metadata — flatten/target/radius modes), the exported
    weights' fingerprint, and the eval-relevant task modes actually resolved
    at export time. A deployed artifact can always answer 'which training
    run produced you, with which feature semantics?'."""
    entry = dict(store.stages().get(stage, {}))
    entry.pop("path", None)  # host-local detail; the store root covers it
    prov = {
        "store": os.path.abspath(store.root),
        "stage": stage,
        "stage_manifest": entry,
        "params_sha256": params_fingerprint(params),
    }
    if task is not None:
        prov["task_modes"] = {
            k: getattr(task, k)
            for k in ("compat_vq_flatten", "input_mode", "target_mode",
                      "predict_radius")
            if hasattr(task, k)
        }
    return prov


def make_serving_fn(task, params, composite_params, use_joint, config,
                    from_audio: bool = False):
    """Build the end-to-end inference closure the export serializes.

    Returns ``(serve, predicts_radius)`` where ``serve`` maps an echoed
    power spectrogram ``(B, num_freq, num_frames)`` (the deployment
    observable — what a microphone's STFT produces) to a
    ``(theta_rad, radius_m, coords_m)`` tuple: angle in radians, source
    radius in meters (the range head's prediction when the model has one,
    else the config's fixed ``R``), and 3-D source coordinates from the
    config's receiver/room geometry. Parameters are closed over, so the
    exported program is self-contained.

    ``from_audio=True`` fuses the STFT frontend into the program: the input
    becomes the raw microphone waveform ``(B, config.audio_samples)`` and
    the spectrogram comes from :func:`..data.synth.observed_power_spec` —
    the SAME function ``synthesize_batch`` builds its spectrogram fields
    from — so one artifact goes from samples to coordinates with no way for
    serving preprocessing to diverge from training."""
    receiver = jnp.asarray(config.receiver_position, jnp.float32)
    room = jnp.asarray(config.room_dimensions, jnp.float32)
    model = task.build_model()
    predicts_radius = bool(getattr(task, "predict_radius", False))

    if use_joint:

        def raw(spec):
            # reuse the task's input pipeline (tasks.py:700) so train-time
            # preprocessing and the exported artifact can never diverge
            (x,) = task.model_inputs(SimpleNamespace(echoed_spec=spec))
            return model.apply({"params": params}, x)[0]

    else:
        composite = task.build_composite()

        def raw(spec):
            # encodings_from_composite only reads .echoed_spec (tasks.py:460)
            feats = task.encodings_from_composite(
                composite, composite_params, SimpleNamespace(echoed_spec=spec)
            )
            return model.apply({"params": params}, feats)

    def serve(x):
        if from_audio:
            # THE shared frontend (data/synth.py observed_power_spec):
            # synthesize_batch builds echoed_spec from the same function, so
            # the artifact and training preprocessing cannot diverge
            spec = observed_power_spec(x, config)
        else:
            spec = x
        pred = raw(spec)
        theta = task.decode_angle(pred).reshape(-1)
        if predicts_radius:
            radius = task.decode_radius(pred).reshape(-1)
        else:
            radius = jnp.full(theta.shape, jnp.float32(config.R))
        coords = source_coordinates(
            theta, receiver, room, radius, config.Z_LOC_SOURCE
        )
        return theta, radius, coords

    return serve, predicts_radius


def export_localizer(
    task,
    params,
    composite_params,
    use_joint,
    config,
    out_dir: str,
    batch_size: Optional[int] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    serve_fn=None,
    from_audio: bool = False,
    provenance: Optional[dict] = None,
) -> dict:
    """Serialize the localizer's inference program to ``out_dir``.

    ``batch_size=None`` (default) exports a SYMBOLIC batch dimension — one
    artifact serves any batch size; an int pins it (marginally smaller /
    stricter artifact). ``platforms`` lists the backends the program is
    lowered for (cross-lowering needs no physical device, so a CPU host can
    produce a TPU-serving artifact). Writes ``localizer.stablehlo`` and a
    ``serving.json`` sidecar; returns the sidecar dict.

    ``serve_fn``: optional prebuilt closure from :func:`make_serving_fn` —
    callers that also run the closure directly (e.g. the export script's
    reload-and-compare check) pass it in so the serialized program and the
    live comparison are guaranteed to be the same object."""
    if serve_fn is None:
        serve_fn, predicts_radius = make_serving_fn(
            task, params, composite_params, use_joint, config,
            from_audio=from_audio,
        )
    else:
        predicts_radius = bool(getattr(task, "predict_radius", False))
    serve = serve_fn
    if batch_size is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch_size)
    in_shape = (
        (b, config.audio_samples)
        if from_audio
        else (b, config.num_freq, config.num_frames)
    )
    arg = jax.ShapeDtypeStruct(in_shape, jnp.float32)
    exported = jax.export.export(jax.jit(serve), platforms=list(platforms))(arg)
    blob = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, SERVING_BLOB), "wb") as f:
        f.write(blob)
    meta = {
        "input": {
            "name": "echoed_waveform" if from_audio else "echoed_power_spectrogram",
            "shape": ["b" if batch_size is None else int(batch_size)]
            + [int(d) for d in in_shape[1:]],
            "dtype": "float32",
        },
        "outputs": ["theta_rad", "radius_m", "coords_m"],
        "model": "joint" if use_joint else "frozen",
        "predicts_radius": predicts_radius,
        "platforms": list(platforms),
        "bytes": len(blob),
        "geometry": config.to_reference_dict(),
    }
    if provenance:
        meta["provenance"] = provenance
    with open(os.path.join(out_dir, SERVING_META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def update_sidecar(path: str, **fields) -> dict:
    """Merge post-export fields (the reload-and-compare eval summary, a
    latency bench) into an artifact's ``serving.json`` — the sidecar is the
    artifact's one self-describing record, so verification results belong in
    it, not just on a terminal."""
    sidecar = os.path.join(path, SERVING_META)
    with open(sidecar) as f:
        meta = json.load(f)
    meta.update(fields)
    with open(sidecar, "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_localizer(path: str) -> Tuple:
    """Restore ``(call, meta)`` from an :func:`export_localizer` directory.
    ``call(spec)`` runs the deserialized program on the current platform
    (which must be one of ``meta['platforms']``); no model code needed."""
    with open(os.path.join(path, SERVING_META)) as f:
        meta = json.load(f)
    with open(os.path.join(path, SERVING_BLOB), "rb") as f:
        exported = jax.export.deserialize(f.read())
    return exported.call, meta

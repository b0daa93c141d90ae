"""End-to-end multi-stage pipeline (BASELINE.json config #5).

Reproduces the reference's stage graph with explicit parameter handoff
instead of whole-module pickles:

    speech VQ-VAE ----\\
                       +--> echoed composite --> encoder fine-tune --> location
    rir VQ-VAE -------/

(reference: train_speech.py + train_rir.py -> train_echoed_speech.py:18-19
loads both -> encoder_training_echoed_model.py:43 reloads the composite ->
train_location.py:38 reads the composite for frozen latents.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from ..data.config import DatasetConfig
from ..data.synth import SampleBatch
from .loop import Trainer, TrainHistory, TrainState
from .tasks import (
    EchoedSpeechTask,
    EncoderFinetuneTask,
    JointLocationTask,
    LocationTask,
    RirVQVAETask,
    SpeechVQVAETask,
    graft_pretrained,
)

__all__ = ["run_stage", "run_pipeline", "fit_joint_recipe"]


def _copy_tree(tree):
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda a: jnp.array(a), tree)


def run_stage(
    task,
    key: jax.Array,
    train_data: SampleBatch,
    val_data: Optional[SampleBatch],
    store_dir: Optional[str] = None,
    mesh=None,
    num_updates: Optional[int] = None,
    initial_params: Any = None,
    composite_params: Any = None,
    resume: bool = False,
    **trainer_kwargs,
) -> Tuple[Trainer, TrainState, TrainHistory]:
    trainer = Trainer(
        task, mesh=mesh, checkpoint_dir=store_dir, composite_params=composite_params,
        **trainer_kwargs,
    )
    state = trainer.init_state(key, train_data)
    if initial_params is not None:
        seeded = _copy_tree(initial_params)  # step donation must not eat the donor
        state = state.replace(params=seeded, opt_state=trainer.optimizer.init(seeded))
    state, history = trainer.fit(
        state, train_data, val_data, num_updates=num_updates, resume=resume
    )
    return trainer, state, history


def fit_joint_recipe(
    task,
    key: jax.Array,
    train_data: Optional[SampleBatch],
    val_data: Optional[SampleBatch],
    store_dir: Optional[str],
    mesh,
    composite_params: Any,
    bank_updates: int,
    num_updates: Optional[int],
    exact_synth_kwargs: Optional[Dict] = None,
    resume: bool = False,
    initial_state: Optional[TrainState] = None,
    polish_bank_prob: float = 0.0,
    **trainer_kwargs,
) -> Tuple[TrainState, TrainHistory]:
    """The validated production recipe as ONE invocation (VALIDATION.md runs
    G/H: bank pretraining matches exact-synthesis quality everywhere except
    off the radius grid at near range; a short exact-synthesis polish removes
    that artifact at ~2-3x lower total cost than all-exact training).

    Leg 1 trains ``bank_updates`` on-the-fly updates drawing from the RIR
    bank in ``trainer_kwargs["synth_kwargs"]``; leg 2 drops the bank,
    switches to ``exact_synth_kwargs`` (continuous traced-Sabine synthesis),
    and polishes to ``num_updates`` total. One store, one step numbering:
    leg 1 ends with a periodic checkpoint and suppresses the stage-final tag
    (``fit(save_final=False)``), so the stage only reads as complete after
    the polish — and ``resume=True`` restarts a crashed run inside whichever
    leg it died in (a restore past ``bank_updates`` makes leg 1 a no-op).

    The hard bank->exact switch is a distribution shift the polish leg must
    re-converge through: the training error roughly DOUBLES at the boundary
    and decays back over tens of thousands of updates (run J: 0.163 -> 0.315
    at the switch, only 0.224 after a 20k polish; run H's 50k polish
    re-converged 0.09 -> 0.055 — VERDICT r4 weak #3). Hence two guards:
    a warning when the polish budget is below the measured ~50k
    re-convergence horizon, and ``polish_bank_prob`` — per-sample MIXED
    bank/exact sampling in the polish leg (``synthesize_batch
    bank_mix_prob``): each polish step draws each sample from the bank with
    this probability and from exact synthesis otherwise, softening the
    boundary instead of jumping it. 0 (default) = the validated hard
    switch."""
    if num_updates is None:
        num_updates = task.num_updates
    if not 0 < bank_updates < num_updates:
        raise ValueError(
            f"bank_updates must satisfy 0 < bank < total updates, got "
            f"{bank_updates} of {num_updates}"
        )
    if not 0.0 <= float(polish_bank_prob) < 1.0:
        raise ValueError(
            f"polish_bank_prob must be in [0, 1), got {polish_bank_prob}"
        )
    polish_updates = num_updates - bank_updates
    if polish_updates < 50_000 and polish_updates < bank_updates:
        # Skip the warning when the whole run is small (smoke/test budgets
        # scale both legs down together); warn when a production-sized bank
        # leg is followed by a polish too short to re-converge.
        import warnings

        warnings.warn(
            f"polish leg is {polish_updates} updates — below the measured "
            f"~50k re-convergence horizon of the bank->exact distribution "
            f"shift (run H re-converged inside 50k; run J's 20k polish ended "
            f"WORSE than its bank leg, 0.224 vs 0.163 train error). Either "
            f"budget >= 50k polish updates or soften the boundary with "
            f"polish_bank_prob (--polish-bank-prob).",
            stacklevel=2,
        )
    synth_kw = trainer_kwargs.get("synth_kwargs") or {}
    if "rir_bank" not in synth_kw:
        raise ValueError(
            "bank pretraining needs a RIR bank in synth_kwargs (CLI: "
            "--rir-bank N with --on-the-fly)"
        )
    if (exact_synth_kwargs or {}).get("rir_bank") is not None:
        raise ValueError("exact_synth_kwargs must not carry a rir_bank")
    trainer = Trainer(task, mesh=mesh, checkpoint_dir=store_dir, **trainer_kwargs)
    if initial_state is not None:
        state = initial_state
    else:
        state = trainer.init_state(
            key, train_data if train_data is not None else val_data
        )
        seeded = task.seed_params(state.params, composite_params)
        state = state.replace(params=seeded, opt_state=trainer.optimizer.init(seeded))
    state, h1 = trainer.fit(
        state, train_data, val_data, num_updates=bank_updates, resume=resume,
        save_final=False,
    )
    if store_dir:
        # Pin the leg boundary as a periodic tag so leg 2's resume lands on
        # it even when bank_updates is off the ckpt_every cadence.
        trainer.save_checkpoint(
            state, tag=f"{task.name}_{int(jax.device_get(state.step))}"
        )
    if trainer.verbose:
        print(
            f"[{task.name}] bank pretraining done at step "
            f"{int(jax.device_get(state.step))}; polishing with exact "
            f"synthesis to {num_updates}", flush=True,
        )
    tk2 = dict(trainer_kwargs)
    tk2["synth_kwargs"] = dict(exact_synth_kwargs or {})
    if polish_bank_prob:
        # Mixed polish: keep the bank as a step operand and mix per sample.
        tk2["synth_kwargs"]["rir_bank"] = synth_kw["rir_bank"]
        if "rir_bank_radii" in synth_kw:
            tk2["synth_kwargs"]["rir_bank_radii"] = synth_kw["rir_bank_radii"]
        tk2["synth_kwargs"]["bank_mix_prob"] = float(polish_bank_prob)
    trainer2 = Trainer(task, mesh=mesh, checkpoint_dir=store_dir, **tk2)
    if store_dir:
        state, h2 = trainer2.fit(
            state, train_data, val_data, num_updates=num_updates, resume=True
        )
    else:
        # No store to resume through: run the remaining updates directly
        # (state.step already carries the leg-1 count).
        remaining = num_updates - int(jax.device_get(state.step))
        state, h2 = trainer2.fit(
            state, train_data, val_data, num_updates=max(remaining, 0)
        )
    merged = TrainHistory()
    for h in (h1, h2):
        for split in ("train", "val"):
            store = merged.train if split == "train" else merged.val
            for k, v in getattr(h, split).items():
                store.setdefault(k, []).extend(v)
    return state, merged


def run_pipeline(
    key: jax.Array,
    train_data: SampleBatch,
    val_data: Optional[SampleBatch],
    store_dir: Optional[str] = None,
    config: DatasetConfig = DatasetConfig(),
    width_scale: float = 1.0,
    updates: Optional[Dict[str, int]] = None,
    mesh=None,
    vq_backend: str = "xla",
    compute_dtype: str = "float32",
    preset: str = "compat",
    vq_ema: Optional[bool] = None,
    commitment_weight: Optional[float] = None,
    location_input_mode: Optional[str] = None,
    location_target_mode: Optional[str] = None,
    compat_vq_flatten: Optional[bool] = None,
    joint_location: bool = False,
    predict_radius: bool = False,
    resume: bool = False,
    ckpt_every: Optional[int] = None,
    sequence_axis: object = None,
    joint_bank_updates: Optional[int] = None,
    joint_exact_synth_kwargs: Optional[Dict] = None,
    joint_polish_bank_prob: float = 0.0,
    joint_task_kwargs: Optional[Dict] = None,
    **trainer_kwargs,
) -> Dict[str, Any]:
    """Run all five stages; returns {stage: (params, history, variables)}
    (``variables`` carries non-trainable collections, e.g. EMA vq_stats;
    empty dict for param-mode stages).

    ``resume=True`` (requires ``store_dir``) makes the one-command pipeline
    crash-safe: stages whose FINAL checkpoint exists in the StageStore are
    skipped (their params reload from the store for the handoff; history is
    ``None``), and the first incomplete stage restarts from its newest
    periodic checkpoint via ``Trainer.fit(resume=True)`` — so a crash in
    stage 5 of a multi-hour run no longer restarts from stage 1 (the
    reference loses everything but the last pickle, SURVEY.md §5.3).

    ``preset="compat"`` (default) is the reference configuration exactly.
    ``preset="fixed"`` is the best VALIDATED configuration (VALIDATION.md):
    the fine-tune stage anchors its unfrozen encoders with
    ``commitment_weight=0.25`` (without it the reference's recon-only phase-2
    loss collapses the speech codebook to perplexity 1), and the location
    stage regresses from the dense quantized RIR latents
    (``input_mode="quantized"``, held-out 0.225 theta/pi MSE vs the compat
    path's trivial-predictor plateau at 0.338), and the VQ quantizes proper
    channels-last D-vectors (``compat_vq_flatten=False``) instead of the
    reference's memory-order time-chunks. Explicit keyword arguments
    override the preset field-by-field.
    """
    if preset not in ("compat", "fixed"):
        raise ValueError(f"unknown preset {preset!r}")
    fixed = preset == "fixed"
    vq_ema = bool(vq_ema) if vq_ema is not None else False
    commitment_weight = commitment_weight if commitment_weight is not None else (0.25 if fixed else 0.0)
    location_input_mode = location_input_mode or ("quantized" if fixed else "encodings")
    # The joint stage (6) defaults to the circular sincos target (best
    # validated, VALIDATION.md); the frozen stage-5 location keeps theta/pi
    # unless the caller asks otherwise (sincos stalls at the mean attractor
    # on stage 5's weak frozen inputs).
    joint_target_mode = location_target_mode or "sincos"
    location_target_mode = location_target_mode or "normalized_angle"
    compat_vq_flatten = compat_vq_flatten if compat_vq_flatten is not None else not fixed

    updates = updates or {}
    results: Dict[str, Any] = {}
    kw = dict(
        config=config, width_scale=width_scale, vq_backend=vq_backend,
        compute_dtype=compute_dtype, compat_vq_flatten=compat_vq_flatten,
    )
    if ckpt_every is not None:
        kw["ckpt_every"] = ckpt_every
    # Sequence parallelism applies to the stages with a long (time) conv
    # axis: speech, echoed, finetune. The rir stage rejects it (short freq
    # axis) and the location stages have no time axis in their compute.
    # Requires the vectors VQ flatten (preset "fixed" or compat_vq_flatten
    # False) — an explicit compat request raises in the model.
    seq_kw = {"sequence_axis": sequence_axis} if sequence_axis is not None else {}

    if resume and not store_dir:
        raise ValueError("resume=True requires store_dir")
    from ..utils.checkpoint import StageStore

    store = StageStore(store_dir) if (resume and store_dir) else None

    def _completed(name: str):
        """(params, variables) reloaded from the stage's FINAL checkpoint,
        or None if the stage hasn't finished."""
        if store is None or not store.has_stage(name):
            return None
        meta = store.stage_metadata(name)
        if not meta.get("final"):
            return None
        # A resumed store may have been written under different flags. The
        # VQ flatten mode is shape-invisible (identical param trees, different
        # code semantics — vector_quantizer.py:32), so a mismatch would graft
        # garbage into the downstream stages with no error; refuse instead.
        if "compat_vq_flatten" in meta and bool(meta["compat_vq_flatten"]) != compat_vq_flatten:
            names = {True: "compat", False: "vectors"}
            raise ValueError(
                f"resume: stage {name!r} in {store_dir!r} was trained with the "
                f"{names[bool(meta['compat_vq_flatten'])]!r} VQ flatten but this "
                f"pipeline resolves to {names[compat_vq_flatten]!r} — its codebook "
                "codes mean different things and the handoff would silently "
                "corrupt training. Re-run with the matching --vq-flatten/preset, "
                "or point --store-dir at a fresh store."
            )
        tree = store.load_stage(name)
        print(f"[pipeline] stage {name!r} complete in store — skipping", flush=True)
        return tree["params"], tree.get("variables") or {}

    keys = jax.random.split(key, 5)

    # Stage 1+2: the two VQ-VAEs.
    done = _completed("speech")
    if done is not None:
        speech_params, speech_vars = done
        results["speech"] = (speech_params, None, speech_vars)
    else:
        _, speech_state, h = run_stage(
            SpeechVQVAETask(**kw, vq_ema=vq_ema, **seq_kw), keys[0], train_data, val_data,
            store_dir, mesh, num_updates=updates.get("speech"), resume=resume,
            **trainer_kwargs,
        )
        speech_params, speech_vars = speech_state.params, speech_state.variables
        results["speech"] = (speech_params, h, speech_vars)

    done = _completed("rir")
    if done is not None:
        rir_params, rir_vars = done
        results["rir"] = (rir_params, None, rir_vars)
    else:
        _, rir_state, h = run_stage(
            RirVQVAETask(**kw, vq_ema=vq_ema), keys[1], train_data, val_data,
            store_dir, mesh, num_updates=updates.get("rir"), resume=resume,
            **trainer_kwargs,
        )
        rir_params, rir_vars = rir_state.params, rir_state.variables
        results["rir"] = (rir_params, h, rir_vars)

    # Stage 3: composite with grafted pretrained encoders. EMA-trained
    # codebooks live in TrainState.variables["vq_stats"]; graft converts them
    # into the composite's frozen param-mode codebook slots.
    #
    # NO commitment anchor here: the anchor was validated for the FINETUNE
    # stage, where the unfrozen encoders also receive reconstruction
    # gradients that balance it. In this stage the latents are
    # stop-gradient'd (train_encoder=False), so an anchor would be the ONLY
    # gradient reaching the branch encoders — pure commitment pull with
    # nothing opposing it collapses them (measured: speech perplexity -> 1.0
    # and echoed recon stuck at ~0.77 vs ~0.16 unanchored, VALIDATION.md).
    echoed_task = EchoedSpeechTask(**kw, **seq_kw)
    done = _completed("echoed")
    if done is not None:
        echoed_params, echoed_vars = done
        results["echoed"] = (echoed_params, None, echoed_vars)
    else:
        trainer = Trainer(echoed_task, mesh=mesh, checkpoint_dir=store_dir, **trainer_kwargs)
        state = trainer.init_state(keys[2], train_data)
        grafted = graft_pretrained(
            state.params,
            speech_params=speech_params,
            rir_params=rir_params,
            speech_variables=speech_vars if vq_ema else None,
            rir_variables=rir_vars if vq_ema else None,
        )
        state = state.replace(params=grafted, opt_state=trainer.optimizer.init(grafted))
        state, h = trainer.fit(
            state, train_data, val_data, num_updates=updates.get("echoed"), resume=resume
        )
        echoed_params, echoed_vars = state.params, state.variables
        results["echoed"] = (echoed_params, h, echoed_vars)

    # Stage 4: encoder fine-tune continues from the composite.
    ft_task = EncoderFinetuneTask(**kw, commitment_weight=commitment_weight, **seq_kw)
    done = _completed("finetune")
    if done is not None:
        ft_params, ft_vars = done
        results["finetune"] = (ft_params, None, ft_vars)
    else:
        ft_trainer = Trainer(ft_task, mesh=mesh, checkpoint_dir=store_dir, **trainer_kwargs)
        ft_state = ft_trainer.init_state(keys[3], train_data)
        seeded = _copy_tree(echoed_params)
        ft_state = ft_state.replace(params=seeded, opt_state=ft_trainer.optimizer.init(seeded))
        ft_state, h = ft_trainer.fit(
            ft_state, train_data, val_data, num_updates=updates.get("finetune"), resume=resume
        )
        ft_params, ft_vars = ft_state.params, ft_state.variables
        results["finetune"] = (ft_params, h, ft_vars)

    # Stage 5: location regression over the frozen fine-tuned composite.
    loc_task = LocationTask(
        **kw, input_mode=location_input_mode, target_mode=location_target_mode
    )
    done = _completed("location")
    if done is not None:
        results["location"] = (done[0], None, done[1])
    else:
        _, loc_state, h = run_stage(
            loc_task, keys[4], train_data, val_data, store_dir, mesh,
            num_updates=updates.get("location"), composite_params=ft_params,
            resume=resume, **trainer_kwargs,
        )
        results["location"] = (loc_state.params, h, loc_state.variables)

    # Optional stage 6 (beyond parity, ``joint_location=True``): fine-tune
    # the RIR encoder JOINTLY with a fresh location head on the angle loss,
    # seeded from the fine-tuned composite — the representation adapts to
    # the localization objective, which the reference's frozen-composite
    # design never allows (train_location.py:69).
    if joint_location:
        joint_task = JointLocationTask(
            config=config, width_scale=width_scale, vq_backend=vq_backend,
            compute_dtype=compute_dtype, compat_vq_flatten=compat_vq_flatten,
            target_mode=joint_target_mode, predict_radius=predict_radius,
            **({"ckpt_every": ckpt_every} if ckpt_every is not None else {}),
            **(joint_task_kwargs or {}),
        )
        done = _completed("location_joint")
        if done is not None:
            results["location_joint"] = (done[0], None, done[1])
            return results
        key6 = jax.random.fold_in(key, 6)
        # (cache_frozen in trainer_kwargs is ignored: the joint stage trains
        # the encoder, so the task exposes no frozen path to cache)
        if joint_bank_updates:
            # One-command run-H recipe: bank pretraining + exact polish.
            j_state, h = fit_joint_recipe(
                joint_task, key6, train_data, val_data, store_dir, mesh,
                composite_params=ft_params, bank_updates=joint_bank_updates,
                num_updates=updates.get("location_joint"),
                exact_synth_kwargs=joint_exact_synth_kwargs,
                polish_bank_prob=joint_polish_bank_prob, resume=resume,
                **trainer_kwargs,
            )
            results["location_joint"] = (j_state.params, h, j_state.variables)
            return results
        trainer = Trainer(joint_task, mesh=mesh, checkpoint_dir=store_dir, **trainer_kwargs)
        j_state = trainer.init_state(key6, train_data if train_data is not None else val_data)
        seeded = joint_task.seed_params(j_state.params, ft_params)
        j_state = j_state.replace(params=seeded, opt_state=trainer.optimizer.init(seeded))
        j_state, h = trainer.fit(
            j_state, train_data, val_data, num_updates=updates.get("location_joint"),
            resume=resume,
        )
        results["location_joint"] = (j_state.params, h, j_state.variables)
    return results

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
    LocationTask,
    RirVQVAETask,
    SpeechVQVAETask,
    graft_pretrained,
)

__all__ = ["run_stage", "run_pipeline"]


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
    state, history = trainer.fit(state, train_data, val_data, num_updates=num_updates)
    return trainer, state, history


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
    **trainer_kwargs,
) -> Dict[str, Any]:
    """Run all five stages; returns {stage: (params, history)}."""
    updates = updates or {}
    results: Dict[str, Any] = {}
    kw = dict(
        config=config, width_scale=width_scale, vq_backend=vq_backend,
        compute_dtype=compute_dtype,
    )

    keys = jax.random.split(key, 5)

    # Stage 1+2: the two VQ-VAEs.
    _, speech_state, h = run_stage(
        SpeechVQVAETask(**kw), keys[0], train_data, val_data, store_dir, mesh,
        num_updates=updates.get("speech"), **trainer_kwargs,
    )
    results["speech"] = (speech_state.params, h)

    _, rir_state, h = run_stage(
        RirVQVAETask(**kw), keys[1], train_data, val_data, store_dir, mesh,
        num_updates=updates.get("rir"), **trainer_kwargs,
    )
    results["rir"] = (rir_state.params, h)

    # Stage 3: composite with grafted pretrained encoders.
    echoed_task = EchoedSpeechTask(**kw)
    trainer = Trainer(echoed_task, mesh=mesh, checkpoint_dir=store_dir, **trainer_kwargs)
    state = trainer.init_state(keys[2], train_data)
    grafted = graft_pretrained(
        state.params, speech_params=speech_state.params, rir_params=rir_state.params
    )
    state = state.replace(params=grafted, opt_state=trainer.optimizer.init(grafted))
    state, h = trainer.fit(state, train_data, val_data, num_updates=updates.get("echoed"))
    results["echoed"] = (state.params, h)

    # Stage 4: encoder fine-tune continues from the composite.
    ft_task = EncoderFinetuneTask(**kw)
    ft_trainer = Trainer(ft_task, mesh=mesh, checkpoint_dir=store_dir, **trainer_kwargs)
    ft_state = ft_trainer.init_state(keys[3], train_data)
    seeded = _copy_tree(state.params)
    ft_state = ft_state.replace(params=seeded, opt_state=ft_trainer.optimizer.init(seeded))
    ft_state, h = ft_trainer.fit(
        ft_state, train_data, val_data, num_updates=updates.get("finetune")
    )
    results["finetune"] = (ft_state.params, h)

    # Stage 5: location regression over the frozen fine-tuned composite.
    loc_task = LocationTask(**kw)
    _, loc_state, h = run_stage(
        loc_task, keys[4], train_data, val_data, store_dir, mesh,
        num_updates=updates.get("location"), composite_params=ft_state.params,
        **trainer_kwargs,
    )
    results["location"] = (loc_state.params, h)
    return results

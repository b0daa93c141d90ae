"""Training layer: the five stage task specs and the single generic
mesh-sharded training loop (replacing the reference's per-script loops)."""

from .loop import OtfArrays, Preempted, Trainer, TrainHistory, TrainState
from .pipeline import fit_joint_recipe, run_pipeline, run_stage
from .tasks import (
    EchoedSpeechTask,
    EncoderFinetuneTask,
    JointLocationTask,
    LocationTask,
    RirVQVAETask,
    SpeechVQVAETask,
    Task,
    check_flatten_handoff,
    graft_pretrained,
    make_task,
    resolved_vq_flatten,
)

__all__ = [
    "Preempted",
    "Trainer",
    "OtfArrays",
    "TrainHistory",
    "TrainState",
    "fit_joint_recipe",
    "run_pipeline",
    "run_stage",
    "EchoedSpeechTask",
    "EncoderFinetuneTask",
    "JointLocationTask",
    "LocationTask",
    "RirVQVAETask",
    "SpeechVQVAETask",
    "Task",
    "check_flatten_handoff",
    "graft_pretrained",
    "make_task",
    "resolved_vq_flatten",
]

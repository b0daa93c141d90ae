"""Pipeline-level crash resume (SURVEY.md §5.3; VERDICT round-2 item 4).

The reference's multi-script pipeline loses everything before the last
whole-module pickle on a crash (train_echoed_speech.py:18-19 hand-loads the
previous stages). ``run_pipeline(resume=True)`` must instead skip stages
whose FINAL checkpoint is in the StageStore and restart the in-progress
stage from its newest periodic checkpoint.
"""

import jax
import numpy as np
import pytest

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.train import run_pipeline
from acoustic_locating_vq_vae_tpu.train.loop import Trainer

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32
UPDATES = {"speech": 2, "rir": 2, "echoed": 4, "finetune": 2, "location": 2}


def test_pipeline_kill_and_restart(tmp_path, capsys, monkeypatch):
    """Kill the pipeline right after stage 3's first periodic checkpoint;
    the resumed run must reuse stages 1-2 from the store and continue stage 3
    from step 2 instead of restarting from scratch."""
    train = D.make_dataset(jax.random.PRNGKey(0), 16, SMALL, batch=16, rir_chunk=2048)
    val = D.make_dataset(jax.random.PRNGKey(1), 8, SMALL, batch=8, rir_chunk=2048)

    orig_save = Trainer.save_checkpoint

    def crashing_save(self, state, tag, final=False):
        orig_save(self, state, tag, final=final)
        if tag == "echoed_2":
            raise KeyboardInterrupt("simulated crash mid-stage-3")

    monkeypatch.setattr(Trainer, "save_checkpoint", crashing_save)
    with pytest.raises(KeyboardInterrupt):
        run_pipeline(
            jax.random.PRNGKey(7), train, val, store_dir=str(tmp_path),
            config=SMALL, width_scale=WS, updates=UPDATES, ckpt_every=2,
            verbose=False,
        )
    monkeypatch.setattr(Trainer, "save_checkpoint", orig_save)
    capsys.readouterr()

    res = run_pipeline(
        jax.random.PRNGKey(7), train, val, store_dir=str(tmp_path),
        config=SMALL, width_scale=WS, updates=UPDATES, ckpt_every=2,
        resume=True,
    )
    out = capsys.readouterr().out
    # Stages 1-2 skipped (reused from the store)...
    assert "stage 'speech' complete in store" in out
    assert "stage 'rir' complete in store" in out
    assert res["speech"][1] is None and res["rir"][1] is None
    # ...stage 3 resumed mid-flight from the periodic checkpoint at step 2.
    assert "[echoed] resumed at step 2" in out
    assert res["echoed"][1] is not None
    # The whole pipeline still completes with finite results.
    for stage in ("speech", "rir", "echoed", "finetune", "location"):
        assert stage in res
        leaves = jax.tree_util.tree_leaves(res[stage][0])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # The resumed stage-3 history covers only the remaining updates (2 of 4).
    assert len(res["echoed"][1].train.get("loss", [])) + len(
        res["echoed"][1].val.get("loss", [])
    ) == 2


def test_pipeline_resume_requires_store():
    with pytest.raises(ValueError, match="store_dir"):
        run_pipeline(jax.random.PRNGKey(0), None, None, resume=True)


def test_pipeline_resume_rejects_flatten_mismatch(tmp_path):
    """Resuming into a store trained under the OTHER VQ flatten mode must
    refuse: the stored codebooks are shape-compatible but their codes mean
    different things (vector_quantizer.py:32), so silently reusing them
    would corrupt every downstream stage."""
    train = D.make_dataset(jax.random.PRNGKey(0), 16, SMALL, batch=16, rir_chunk=2048)
    run_pipeline(
        jax.random.PRNGKey(7), train, None, store_dir=str(tmp_path),
        config=SMALL, width_scale=WS, updates=UPDATES, verbose=False,
        preset="compat",
    )
    with pytest.raises(ValueError, match="VQ flatten"):
        run_pipeline(
            jax.random.PRNGKey(7), train, None, store_dir=str(tmp_path),
            config=SMALL, width_scale=WS, updates=UPDATES, verbose=False,
            preset="fixed", resume=True,
        )

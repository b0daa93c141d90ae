"""Periodic-checkpoint garbage collection (Trainer keep_checkpoints= /
StageStore.delete_stage): bounded disk growth for long stages — the
reference pickles every 1000 updates and keeps everything
(train_speech.py:117-118; a six-stage full-config run accumulates ~29 GB)."""

import json
import os

import numpy as np
import pytest

import jax

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.train import SpeechVQVAETask, Trainer
from acoustic_locating_vq_vae_tpu.utils import StageStore

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32


@pytest.fixture(scope="module")
def batch():
    return D.make_dataset(jax.random.PRNGKey(0), 16, SMALL, batch=16, rir_chunk=2048)


def _periodic_tags(store, name="speech"):
    return sorted(
        (t for t in store.stages() if t.startswith(f"{name}_") and t[len(name) + 1:].isdigit()),
        key=lambda t: int(t.split("_")[-1]),
    )


def test_gc_keeps_newest_n_and_final(tmp_path, batch):
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, ckpt_every=2)
    tr = Trainer(
        task, verbose=False, checkpoint_dir=str(tmp_path), keep_checkpoints=2
    )
    st = tr.init_state(jax.random.PRNGKey(1), batch)
    tr.fit(st, batch, None, num_updates=10)

    store = StageStore(str(tmp_path))
    assert _periodic_tags(store) == ["speech_8", "speech_10"]
    assert store.has_stage("speech")  # the final is never GC'd
    # the deleted checkpoints' directories are gone from disk too
    stage_dirs = os.listdir(tmp_path / "stages")
    assert "speech_2" not in stage_dirs and "speech_4" not in stage_dirs


def test_gc_preserves_resume(tmp_path, batch):
    """GC keeps the NEWEST periodic checkpoints, so restore_latest still
    resumes from the most recent step."""
    def make():
        task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, ckpt_every=2)
        tr = Trainer(
            task, verbose=False, checkpoint_dir=str(tmp_path), keep_checkpoints=1
        )
        return tr, tr.init_state(jax.random.PRNGKey(2), batch)

    tr, st = make()
    st10, _ = tr.fit(st, batch, None, num_updates=10)
    tr2, st2 = make()
    restored = tr2.restore_latest(st2)
    assert restored is not None and restored[1] == 10
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored[0].params["_vq"]["codebook"])),
        np.asarray(jax.device_get(st10.params["_vq"]["codebook"])),
    )


def test_gc_and_resume_survive_stale_higher_step_tags(tmp_path, batch):
    """A from-scratch retrain into a store still holding a PREVIOUS run's
    higher-step periodic tags: GC must rank by save time — step-ranking
    would delete the current run's fresh saves (including a preemption
    save) in favor of the stale ones — and resume must restore the current
    run's newest save, not the stale higher-step one."""
    def make(keep):
        task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, ckpt_every=2)
        tr = Trainer(
            task, verbose=False, checkpoint_dir=str(tmp_path), keep_checkpoints=keep
        )
        return tr, tr.init_state(jax.random.PRNGKey(4), batch)

    tr, st = make(keep=0)  # previous run: keep everything, reach step 10
    tr.fit(st, batch, None, num_updates=10)
    store = StageStore(str(tmp_path))
    store.delete_stage("speech")  # drop the final so the retrain is "fresh"
    assert _periodic_tags(store) == ["speech_2", "speech_4", "speech_6", "speech_8", "speech_10"]

    tr2, st2 = make(keep=2)  # retrain from scratch, only 6 updates
    st6, _ = tr2.fit(st2, batch, None, num_updates=6)
    store = StageStore(str(tmp_path))
    tags = _periodic_tags(store)
    # the fresh saves survive; the stale tags (oldest by time) are retired
    assert tags == ["speech_4", "speech_6"], tags

    tr3, st3 = make(keep=2)
    restored = tr3.restore_latest(st3)
    assert restored is not None and restored[1] == 6
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored[0].params["_vq"]["codebook"])),
        np.asarray(jax.device_get(st6.params["_vq"]["codebook"])),
    )


def test_gc_and_resume_are_immune_to_wall_clock_steps(tmp_path, batch):
    """Recency is the manifest's monotonic per-save seq counter, NOT wall
    time: an NTP step backwards (or a retrain host whose clock lags the
    store's last save) must not make GC delete the newest checkpoint or
    resume restore an older one."""
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, ckpt_every=2)
    tr = Trainer(
        task, verbose=False, checkpoint_dir=str(tmp_path), keep_checkpoints=2
    )
    st = tr.init_state(jax.random.PRNGKey(5), batch)
    st6, _ = tr.fit(st, batch, None, num_updates=6)

    store = StageStore(str(tmp_path))
    assert _periodic_tags(store) == ["speech_4", "speech_6"]
    # simulate the clock having stepped BACK before the newest save
    m = json.load(open(store.manifest_path))
    assert m["speech_6"]["seq"] > m["speech_4"]["seq"]
    m["speech_6"]["time"] = m["speech_4"]["time"] - 300.0
    with open(store.manifest_path, "w") as f:
        json.dump(m, f)

    tr2 = Trainer(
        task, verbose=False, checkpoint_dir=str(tmp_path), keep_checkpoints=2
    )
    restored = tr2.restore_latest(tr2.init_state(jax.random.PRNGKey(6), batch))
    assert restored is not None and restored[1] == 6  # seq outranks time

    # one more save: GC must retire speech_4 (lowest seq), not speech_6
    tr2.fit(restored[0], batch, None, num_updates=8, resume=True)
    assert _periodic_tags(StageStore(str(tmp_path))) == ["speech_6", "speech_8"]


def test_default_keeps_everything(tmp_path, batch):
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, ckpt_every=2)
    tr = Trainer(task, verbose=False, checkpoint_dir=str(tmp_path))
    st = tr.init_state(jax.random.PRNGKey(3), batch)
    tr.fit(st, batch, None, num_updates=6)
    assert _periodic_tags(StageStore(str(tmp_path))) == [
        "speech_2", "speech_4", "speech_6",
    ]


def test_copied_store_is_self_contained(tmp_path):
    """``cp -r store new`` carries the ORIGINAL's absolute paths in the
    copied manifest; stage resolution must prefer the copy's own stages/
    directories — loading from the copy must not read the original, and
    delete_stage on the copy must never delete the original's directories
    (the exact footgun that motivated this: a prune of a copied run-F store
    followed manifest paths back into run E)."""
    import shutil

    a = StageStore(str(tmp_path / "a"))
    a.save_stage("x", {"w": np.full(4, 7.0, np.float32)}, step=3)
    shutil.copytree(tmp_path / "a", tmp_path / "b")

    b = StageStore(str(tmp_path / "b"))
    assert json.load(open(b.manifest_path))["x"]["path"].startswith(str(tmp_path / "a"))
    tree = b.load_stage("x")
    np.testing.assert_array_equal(np.asarray(tree["w"]), 7.0)

    # deleting from the copy removes the copy's dir, NOT the original's
    b.delete_stage("x")
    assert not b.has_stage("x")
    assert not os.path.isdir(tmp_path / "b" / "stages" / "x")
    assert os.path.isdir(tmp_path / "a" / "stages" / "x")
    a.load_stage("x")  # original intact


def test_delete_stage_never_reaches_outside_the_store(tmp_path):
    """A manifest entry pointing at a foreign directory with NO local copy:
    delete_stage drops the entry but leaves the foreign directory alone."""
    a = StageStore(str(tmp_path / "a"))
    a.save_stage("x", {"w": np.zeros(2, np.float32)}, step=1)
    foreign = a.stages()["x"]["path"]

    b = StageStore(str(tmp_path / "b"))
    m = {"x": {"path": foreign, "step": 1, "time": 0, "metadata": {}}}
    with open(b.manifest_path, "w") as f:
        json.dump(m, f)
    b.delete_stage("x")
    assert not b.has_stage("x")
    assert os.path.isdir(foreign)


def test_delete_stage_is_idempotent(tmp_path):
    store = StageStore(str(tmp_path))
    store.save_stage("x", {"a": np.ones(3, np.float32)}, step=1)
    path = store.stages()["x"]["path"]
    assert os.path.isdir(path)
    store.delete_stage("x")
    assert not store.has_stage("x") and not os.path.isdir(path)
    store.delete_stage("x")  # absent -> no-op, no raise

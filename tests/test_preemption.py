"""Graceful preemption (SURVEY.md §5.3): SIGTERM during ``Trainer.fit``
checkpoints (params, opt_state, step) and raises ``Preempted``; restarting
with ``resume=True`` / ``--resume`` then loses at most the in-flight step.
The reference has no counterpart — a killed run loses everything since its
last whole-module pickle and its optimizer state entirely (its pickles never
include the Adam moments, train_speech.py:117-118).

Covers: the programmatic flag path (request_preemption mid-loop), the
no-progress edge (flag set before any step), and a REAL SIGTERM delivered to
a training subprocess followed by an actual --resume restart.
"""

import json
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.train import Preempted, SpeechVQVAETask, Trainer

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def datasets():
    train = D.make_dataset(jax.random.PRNGKey(0), 16, SMALL, batch=16, rir_chunk=2048)
    val = D.make_dataset(jax.random.PRNGKey(1), 8, SMALL, batch=8, rir_chunk=2048)
    return train, val


def test_preempt_mid_fit_checkpoints_and_resumes(datasets, tmp_path, capsys):
    """Preemption after 3 of 10 updates saves tag speech_3; a fresh Trainer
    with resume=True continues from step 3 and runs only the remaining 7."""
    train, val = datasets
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, checkpoint_dir=str(tmp_path), verbose=False)
    state = tr.init_state(jax.random.PRNGKey(2), train)

    orig_step = tr._step_fn
    n_calls = [0]

    def stepping(*a, **kw):
        n_calls[0] += 1
        if n_calls[0] == 3:
            tr.request_preemption()  # as the SIGTERM handler would
        return orig_step(*a, **kw)

    tr._step_fn = stepping
    with pytest.raises(Preempted) as ei:
        tr.fit(state, train, val, num_updates=10)
    assert ei.value.completed == 3
    assert not tr._preempt_requested  # flag cleared on the way out

    manifest = json.load(open(tmp_path / "manifest.json"))
    assert manifest["speech_3"]["step"] == 3
    assert "speech" not in manifest  # no FINAL checkpoint — stage incomplete

    tr2 = Trainer(task, checkpoint_dir=str(tmp_path), verbose=True)
    state2 = tr2.init_state(jax.random.PRNGKey(2), train)
    state2, history = tr2.fit(state2, train, val, num_updates=10, resume=True)
    out = capsys.readouterr().out
    assert "[speech] resumed at step 3" in out
    assert int(jax.device_get(state2.step)) == 10
    n_logged = len(history.train.get("loss", [])) + len(history.val.get("loss", []))
    assert n_logged == 7
    m2 = json.load(open(tmp_path / "manifest.json"))
    assert m2["speech"]["metadata"]["final"] is True


def test_preempt_before_first_step_saves_nothing(datasets, tmp_path):
    train, val = datasets
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, checkpoint_dir=str(tmp_path), verbose=False)
    state = tr.init_state(jax.random.PRNGKey(2), train)
    tr.request_preemption()
    with pytest.raises(Preempted) as ei:
        tr.fit(state, train, val, num_updates=10)
    assert ei.value.completed == 0
    assert not os.path.exists(tmp_path / "manifest.json")


def _read_until(proc, needle, deadline_s):
    """Accumulate child stdout lines until one contains ``needle``."""
    lines = []
    end = time.time() + deadline_s
    while time.time() < end:
        line = proc.stdout.readline()
        if line == "" and proc.poll() is not None:
            break
        lines.append(line)
        if needle in line:
            return lines
    raise AssertionError(
        f"child never printed {needle!r} within {deadline_s}s:\n{''.join(lines)}"
    )


def test_real_sigterm_to_training_script_then_cli_resume(tmp_path):
    """End to end with a real signal: SIGTERM a train_speech.py subprocess
    mid-loop -> exit 75 (EX_TEMPFAIL) with a checkpoint in the store; rerun
    with --resume -> picks up at the saved step. No test hooks in the child —
    this is exactly the production preemption path."""
    script = os.path.join(REPO, "scripts", "train_speech.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    base = [
        sys.executable, "-u", script, "--smoke", "--platform", "cpu",
        "--store-dir", str(tmp_path), "--log-every", "10", "--seed", "3",
    ]
    proc = subprocess.Popen(
        base + ["--updates", "100000"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    try:
        _read_until(proc, "iterations", deadline_s=600)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 75, out
    assert "[preempted]" in out and "--resume" in out

    manifest = json.load(open(tmp_path / "manifest.json"))
    steps = [m["step"] for t, m in manifest.items() if t.startswith("speech_")]
    assert steps, manifest
    saved = max(steps)
    assert saved >= 10

    res = subprocess.run(
        base + ["--updates", str(saved + 5), "--resume"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert f"resumed at step {saved}" in res.stdout
    final_meta = json.load(open(tmp_path / "manifest.json"))["speech"]["metadata"]
    assert final_meta["final"] is True


def test_resume_continues_the_rng_stream_exactly(datasets, tmp_path):
    """Checkpoints carry state.rng, so preempt-at-5 + resume reproduces the
    UNINTERRUPTED 10-update run bit-exactly — without it a same-seed resume
    replays the per-step sampling keys from step 0 (re-training on batches
    already seen) and diverges from the uninterrupted run."""
    train, val = datasets
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)

    straight = Trainer(task, verbose=False)
    s0 = straight.init_state(jax.random.PRNGKey(2), train)
    s_ref, _ = straight.fit(s0, train, None, num_updates=10)

    tr = Trainer(task, checkpoint_dir=str(tmp_path), verbose=False)
    state = tr.init_state(jax.random.PRNGKey(2), train)
    orig_step, n = tr._step_fn, [0]

    def stepping(*a, **kw):
        n[0] += 1
        if n[0] == 5:
            tr.request_preemption()
        return orig_step(*a, **kw)

    tr._step_fn = stepping
    with pytest.raises(Preempted):
        tr.fit(state, train, None, num_updates=10)

    tr2 = Trainer(task, checkpoint_dir=str(tmp_path), verbose=False)
    s2 = tr2.init_state(jax.random.PRNGKey(2), train)
    s_res, _ = tr2.fit(s2, train, None, num_updates=10, resume=True)

    np.testing.assert_array_equal(
        np.asarray(jax.device_get(s_res.rng)), np.asarray(jax.device_get(s_ref.rng))
    )
    ref_leaves = jax.tree_util.tree_leaves(jax.device_get(s_ref.params))
    res_leaves = jax.tree_util.tree_leaves(jax.device_get(s_res.params))
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_from_pre_rng_checkpoint_falls_back_to_fold_in(datasets, tmp_path):
    """Stores written before checkpoints carried the rng (no has_rng in the
    manifest metadata) still restore — with a stream folded off the restored
    step so it at least diverges from the already-consumed prefix."""
    train, val = datasets
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, checkpoint_dir=str(tmp_path), verbose=False)
    state = tr.init_state(jax.random.PRNGKey(2), train)
    # emulate an old checkpoint: same tree minus rng, no has_rng marker
    tr.store.save_stage(
        "speech_4",
        {"params": state.params, "opt_state": state.opt_state},
        step=4, metadata={"task": "speech"},
    )
    restored, completed = tr.restore_latest(state)
    assert completed == 4
    assert int(jax.device_get(restored.step)) == 4
    assert not np.array_equal(
        np.asarray(jax.device_get(restored.rng)),
        np.asarray(jax.device_get(state.rng)),
    )

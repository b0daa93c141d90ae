"""Checkpointing via Orbax.

Replaces the reference's whole-module ``torch.save(model, path)`` pickles
(train_speech.py:117-118 etc., SURVEY.md §5.4) with Orbax checkpoints of
(params, opt_state, step), plus a **stage store** that preserves the
reference's inter-stage handoff semantics: the speech and rir stages publish
their params, the echoed stage grafts them into the composite
(train_echoed_speech.py:18-19), the location stage reads the composite
(train_location.py:38).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["save_pytree", "load_pytree", "StageStore"]


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, template: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path, abstract)
    # Template-less restore is how the stage-handoff scripts read params;
    # orbax warns (it cannot validate topology) — expected and safe here.
    import logging

    logger = logging.getLogger("absl")
    prev = logger.level
    logger.setLevel(logging.ERROR)
    try:
        return ckptr.restore(path)
    except ValueError:
        # Cross-topology restore: the checkpoint was saved on a different
        # device mesh (e.g. an 8-device training run read back on the single
        # eval chip). Rebuild abstract targets from the checkpoint's own
        # metadata, placed on the default device — stage handoff params are
        # replicated trees, so single-device placement is always valid.
        from jax.sharding import SingleDeviceSharding

        meta = ckptr.metadata(path).item_metadata
        dev = jax.devices()[0]
        abstract = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=SingleDeviceSharding(dev)),
            meta,
        )
        return ckptr.restore(path, abstract)
    finally:
        logger.setLevel(prev)


class StageStore:
    """Named parameter trees + manifest, the inter-stage checkpoint API."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        tmp = os.path.abspath(os.environ.get("TMPDIR", "/tmp"))
        if self.root == tmp or self.root.startswith(tmp + os.sep):
            import warnings

            # A machine reboot wiped a full flagship training run (store +
            # corpora) that lived under /tmp — round 4's single costliest
            # loss. One line here is the guard that would have saved it.
            warnings.warn(
                f"StageStore root {self.root!r} is under {tmp!r}, which this "
                "machine clears on reboot: a long training run saved here "
                "does not survive a restart. Prefer a durable path (e.g. "
                "<repo>/stores/).",
                stacklevel=2,
            )
        os.makedirs(self.root, exist_ok=True)
        self.manifest_path = os.path.join(self.root, "manifest.json")

    def _manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {}

    def _stage_path(self, name: str, entry: dict) -> str:
        """Resolve a stage's checkpoint directory RELOCATABLY: prefer this
        store's own ``stages/<name>`` when it exists, falling back to the
        manifest's recorded path. A copied/moved store (``cp -r store new``)
        carries the ORIGINAL absolute paths in its manifest; resolving
        against the root first makes the copy self-contained instead of
        silently reading (or worse, deleting) the original's directories."""
        local = os.path.join(self.root, "stages", name)
        if os.path.isdir(local):
            return local
        p = entry.get("path", local)
        return p if os.path.isabs(p) else os.path.join(self.root, p)

    def save_stage(self, name: str, params: Any, step: int = 0, metadata: Optional[dict] = None):
        path = os.path.join(self.root, "stages", name)
        save_pytree(path, params)
        m = self._manifest()
        m[name] = {
            "path": path,
            "step": int(step),
            "time": time.time(),
            # Monotonic per-store save counter: "which save is newest" must
            # survive wall-clock steps (NTP corrections, a retrain host whose
            # clock lags the original run's), which raw time.time() does not.
            # The Trainer's checkpoint GC and restore_latest rank on this.
            "seq": 1 + max((e.get("seq", -1) for e in m.values()), default=-1),
            "metadata": metadata or {},
        }
        with open(self.manifest_path, "w") as f:
            json.dump(m, f, indent=2)
        return path

    def load_stage(self, name: str, template: Optional[Any] = None) -> Any:
        m = self._manifest()
        if name not in m:
            raise KeyError(f"stage {name!r} not in {self.manifest_path}; have {list(m)}")
        return load_pytree(self._stage_path(name, m[name]), template)

    def has_stage(self, name: str) -> bool:
        return name in self._manifest()

    def stage_metadata(self, name: str) -> dict:
        """The metadata dict recorded at save time ({} if absent/unknown) —
        carries eval-relevant task config (vq flatten / input / target
        modes) so tools can self-configure from a store."""
        return self._manifest().get(name, {}).get("metadata", {}) or {}

    def stages(self) -> dict:
        return self._manifest()

    def delete_stage(self, name: str) -> None:
        """Remove a stage's checkpoint directory and manifest entry (no-op
        when absent) — the primitive behind periodic-checkpoint garbage
        collection (``Trainer(keep_checkpoints=N)``). The reference has no
        counterpart: its training scripts pickle every 1000 updates and keep
        everything (train_speech.py:117-118), ~200 MB per full-config
        checkpoint."""
        import shutil

        m = self._manifest()
        entry = m.pop(name, None)
        if entry is None:
            return
        path = self._stage_path(name, entry)
        # Never delete outside this store: a copied store's manifest can
        # still point at the ORIGINAL's directories (absolute paths) — drop
        # the manifest entry but leave foreign directories alone.
        inside = os.path.commonpath(
            [os.path.abspath(path), self.root]
        ) == self.root if os.path.isdir(path) else False
        if inside:
            shutil.rmtree(path, ignore_errors=True)
        with open(self.manifest_path, "w") as f:
            json.dump(m, f, indent=2)

"""Latent-space analysis: the t-SNE study of echoe_transfer.py (C23).

Collects flattened one-hot VQ encodings from the RIR and speech branches of
a trained composite over a dataset, embeds the RIR encodings with t-SNE, and
returns (embedding, theta) for plotting — the reference's check that RIR
latents organize by source angle (echoe_transfer.py:62-71; its broken tail
:74-76 is omitted)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.synth import SampleBatch
from ..dsp import znorm
__all__ = ["collect_encodings", "tsne_rir_embedding"]


def collect_encodings(
    task, composite_params: Any, batch: SampleBatch, batch_size: int = 64
) -> Dict[str, np.ndarray]:
    """Per-sample flattened one-hot encodings of both branches
    (echoe_transfer.py:41-60)."""
    composite = task.build_composite() if hasattr(task, "build_composite") else task
    cfg = task.config

    @jax.jit
    def encode(comp_p, b: SampleBatch):
        x = znorm(b.echoed_spec, axis=1)
        x_trans = jnp.swapaxes(x, 1, 2)
        _, q_r, _, enc_r = composite.rir_model.apply(
            {"params": comp_p["rir_model"]}, x_trans,
            method=composite.rir_model.get_latent_representation,
        )
        _, q_s, _, enc_s = composite.speech_model.apply(
            {"params": comp_p["speech_model"]}, x,
            method=composite.speech_model.get_latent_representation,
        )
        bsz = x.shape[0]
        return enc_r.reshape(bsz, -1), enc_s.reshape(bsz, -1)

    n = int(batch.speech_spec.shape[0])
    rir_list, speech_list = [], []
    for i in range(0, n, batch_size):
        sub = jax.tree_util.tree_map(lambda a: a[i : i + batch_size], batch)
        r, s = encode(composite_params, sub)
        rir_list.append(np.asarray(r))
        speech_list.append(np.asarray(s))
    return {
        "rir_encodings": np.concatenate(rir_list),
        "speech_encodings": np.concatenate(speech_list),
        "theta": np.asarray(batch.theta).reshape(-1),
    }


def tsne_rir_embedding(
    task, composite_params: Any, batch: SampleBatch, perplexity: float = 30.0, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """2-D t-SNE of RIR encodings + theta colors (echoe_transfer.py:66-71)."""
    from sklearn.manifold import TSNE

    enc = collect_encodings(task, composite_params, batch)
    n = enc["rir_encodings"].shape[0]
    emb = TSNE(
        n_components=2, perplexity=min(perplexity, max(2.0, (n - 1) / 3)), random_state=seed
    ).fit_transform(enc["rir_encodings"])
    return emb, enc["theta"]

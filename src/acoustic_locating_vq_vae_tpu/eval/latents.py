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
__all__ = ["collect_encodings", "tsne_rir_embedding", "linear_angle_probe"]


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


def linear_angle_probe(
    feats_train: np.ndarray,
    theta_train: np.ndarray,
    feats_test: np.ndarray,
    theta_test: np.ndarray,
    ridge_lambda: float = 10.0,
) -> Dict[str, float]:
    """Ridge linear probe features -> (sin theta, cos theta), dual form.

    Quantifies how much source-angle information is LINEARLY decodable from
    a latent representation — the statistic behind VALIDATION.md's round-2
    latent study (frozen-pipeline rir encoder: held-out R^2 -0.20; joint
    fine-tuned: 0.355). Dual (kernel) form keeps high-dimensional features
    cheap: solves (K + lambda I) alpha = Y with K = X X^T.

    Returns {"r2": held-out R^2 on the (sin, cos) targets,
             "angle_rmse_radians": wrap-aware RMSE of atan2-decoded angles}.
    """
    Xtr = np.asarray(feats_train, dtype=np.float64)
    Xte = np.asarray(feats_test, dtype=np.float64)
    ttr = np.asarray(theta_train).reshape(-1)
    tte = np.asarray(theta_test).reshape(-1)
    if len(tte) < 2 or len(ttr) < 2:
        raise ValueError(
            f"linear_angle_probe needs >=2 train and test samples, got "
            f"{len(ttr)}/{len(tte)}"
        )
    Xtr = Xtr.reshape(Xtr.shape[0], -1)
    Xte = Xte.reshape(Xte.shape[0], -1)
    mu = Xtr.mean(axis=0)
    Xtr = Xtr - mu
    Xte = Xte - mu
    Ytr = np.stack([np.sin(ttr), np.cos(ttr)], axis=1)
    Yte = np.stack([np.sin(tte), np.cos(tte)], axis=1)
    K = Xtr @ Xtr.T
    alpha = np.linalg.solve(K + ridge_lambda * np.eye(K.shape[0]), Ytr)
    pred = (Xte @ Xtr.T) @ alpha
    ss_res = float(((pred - Yte) ** 2).sum())
    ss_tot = float(((Yte - Ytr.mean(axis=0)) ** 2).sum())
    if ss_tot == 0.0:
        raise ValueError("degenerate test split: constant (sin, cos) targets")
    ang_err = np.angle(np.exp(1j * (np.arctan2(pred[:, 0], pred[:, 1]) - tte)))
    return {
        "r2": 1.0 - ss_res / ss_tot,
        "angle_rmse_radians": float(np.sqrt(np.mean(ang_err**2))),
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

"""Golden tests for the image-source RIR op.

The oracle is an independent, direct numpy transcription of the Habets
image-source algorithm (the math implemented by the C++ `rir-generator`
package the reference depends on, pyproject.toml:44) — looped and slow, but
trivially auditable. The framework's two XLA formulations (block-matmul and
scatter) must agree with it and with each other.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import dsp


def numpy_ism(source, receiver, room, beta, nsample, fs, c=340.0, hp=True):
    """Direct per-image loop implementation of the Habets image-source method."""
    cTs = c / fs
    s = np.asarray(source, np.float64) / cTs
    r = np.asarray(receiver, np.float64) / cTs
    L = np.asarray(room, np.float64) / cTs
    tw = 2 * int(round(0.004 * fs))
    counts = [int(math.ceil(nsample / (2.0 * L[i]))) for i in range(3)]
    imp = np.zeros(nsample)
    for mx in range(-counts[0], counts[0] + 1):
        for my in range(-counts[1], counts[1] + 1):
            for mz in range(-counts[2], counts[2] + 1):
                for q in (0, 1):
                    for j in (0, 1):
                        for k in (0, 1):
                            qjk = np.array([q, j, k], np.float64)
                            m = np.array([mx, my, mz], np.float64)
                            pos = (1 - 2 * qjk) * s - r + 2 * m * L
                            dist = np.linalg.norm(pos)
                            fdist = math.floor(dist)
                            if fdist >= nsample:
                                continue
                            refl = (
                                beta ** abs(mx - q) * beta ** abs(mx)
                                * beta ** abs(my - j) * beta ** abs(my)
                                * beta ** abs(mz - k) * beta ** abs(mz)
                            )
                            gain = refl / (4 * np.pi * dist * cTs)
                            start = fdist - tw // 2 + 1
                            for n in range(tw):
                                p = start + n
                                if 0 <= p < nsample:
                                    t = p - dist
                                    w = 0.5 * (1 + np.cos(2 * np.pi * t / tw))
                                    sinc = 1.0 if t == 0 else np.sin(np.pi * t) / (np.pi * t)
                                    imp[p] += gain * w * sinc
    if hp:
        # Habets high-pass at 100 Hz
        W = 2 * np.pi * 100.0 / fs
        R1 = np.exp(-W)
        B1 = 2 * R1 * np.cos(W)
        B2 = -R1 * R1
        A1 = -(1 + R1)
        Y = np.zeros(3)
        out = np.zeros_like(imp)
        for idx in range(nsample):
            X0 = imp[idx]
            Y[2] = Y[1]
            Y[1] = Y[0]
            Y[0] = B1 * Y[1] + B2 * Y[2] + X0
            out[idx] = Y[0] + A1 * Y[1] + R1 * Y[2]
        imp = out
    return imp


ROOM = (4.0, 5.0, 3.0)
RECEIVER = np.array([2.5, 1.5, 1.5])
SOURCE = np.array([3.2, 2.1, 1.0])
FS = 16000.0
NSAMPLE = 512
BETA = 0.7


def test_block_matmul_matches_numpy_oracle():
    golden = numpy_ism(SOURCE, RECEIVER, ROOM, BETA, NSAMPLE, FS, hp=False)
    ours = np.asarray(
        dsp.generate_rir(
            jnp.asarray(SOURCE, jnp.float32),
            jnp.asarray(RECEIVER, jnp.float32),
            room=ROOM,
            nsample=NSAMPLE,
            fs=FS,
            beta=BETA,
            hp=False,
            chunk=256,
        )
    )
    scale = np.abs(golden).max()
    np.testing.assert_allclose(ours, golden, atol=2e-4 * scale, rtol=1e-3)


def test_highpass_path_matches_numpy_oracle():
    golden = numpy_ism(SOURCE, RECEIVER, ROOM, BETA, NSAMPLE, FS, hp=True)
    ours = np.asarray(
        dsp.generate_rir(
            jnp.asarray(SOURCE, jnp.float32),
            jnp.asarray(RECEIVER, jnp.float32),
            room=ROOM,
            nsample=NSAMPLE,
            fs=FS,
            beta=BETA,
            hp=True,
            chunk=256,
        )
    )
    scale = np.abs(golden).max()
    np.testing.assert_allclose(ours, golden, atol=5e-4 * scale, rtol=1e-2)


def test_scatter_and_matmul_methods_agree():
    a = dsp.generate_rir(
        jnp.asarray(SOURCE, jnp.float32), jnp.asarray(RECEIVER, jnp.float32),
        room=ROOM, nsample=NSAMPLE, fs=FS, beta=BETA, hp=False, chunk=128,
        method="block_matmul",
    )
    b = dsp.generate_rir(
        jnp.asarray(SOURCE, jnp.float32), jnp.asarray(RECEIVER, jnp.float32),
        room=ROOM, nsample=NSAMPLE, fs=FS, beta=BETA, hp=False, chunk=128,
        method="scatter",
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_rt60_beta_conversion():
    beta = dsp.beta_from_rt60(ROOM, 0.4)
    assert 0.0 < beta < 1.0
    # Sabine closed form
    V = 4 * 5 * 3
    S = 2 * (4 * 5 + 4 * 3 + 5 * 3)
    alpha = 24 * V * np.log(10) / (340.0 * S * 0.4)
    np.testing.assert_allclose(beta, np.sqrt(1 - alpha), rtol=1e-12)
    with pytest.raises(ValueError):
        dsp.beta_from_rt60((1.0, 1.0, 1.0), 0.01)


def test_batched_generation_matches_single():
    sources = np.stack([SOURCE, SOURCE + np.array([0.0, 0.5, 0.2])]).astype(np.float32)
    batch = np.asarray(
        dsp.generate_rir_batch(
            jnp.asarray(sources), jnp.asarray(RECEIVER, jnp.float32),
            room=ROOM, nsample=NSAMPLE, fs=FS, beta=BETA, hp=True, chunk=256,
        )
    )
    for i in range(2):
        single = np.asarray(
            dsp.generate_rir(
                jnp.asarray(sources[i]), jnp.asarray(RECEIVER, jnp.float32),
                room=ROOM, nsample=NSAMPLE, fs=FS, beta=BETA, hp=True, chunk=256,
            )
        )
        np.testing.assert_allclose(batch[i], single, rtol=1e-5, atol=1e-7)


def test_reflection_order_zero_is_direct_path_only():
    """order=0 keeps only the direct path: one windowed-sinc pulse at the
    source-receiver distance."""
    imp = np.asarray(
        dsp.generate_rir(
            jnp.asarray(SOURCE, jnp.float32), jnp.asarray(RECEIVER, jnp.float32),
            room=ROOM, nsample=NSAMPLE, fs=FS, beta=BETA, hp=False, order=0,
            chunk=256,
        )
    )
    dist_samples = np.linalg.norm(SOURCE - RECEIVER) / (340.0 / FS)
    peak = np.argmax(np.abs(imp))
    assert abs(peak - dist_samples) <= 1.0
    # energy concentrated around the pulse
    lo, hi = int(dist_samples) - 70, int(dist_samples) + 70
    assert np.abs(imp[:max(lo, 0)]).max(initial=0.0) < 1e-3 * np.abs(imp).max()
    assert np.abs(imp[hi:]).max(initial=0.0) < 1e-3 * np.abs(imp).max()


def test_block_matmul_rejects_odd_tw():
    """The hoisted tap parity requires even tw; odd must raise, not produce
    silently sign-flipped taps."""
    import pytest
    import jax.numpy as jnp

    from acoustic_locating_vq_vae_tpu.dsp import generate_rir

    with pytest.raises(ValueError, match="even tw"):
        generate_rir(
            jnp.array([1.0, 1.0, 1.0]), jnp.array([2.0, 2.0, 1.5]),
            room=(4.0, 5.0, 3.0), nsample=256, fs=8000.0, rt60=0.25, tw=31,
        )


# --------------------------------------------------- traced-beta (round 3)


def test_traced_beta_matches_static():
    """beta_traced (per-call traced reflection coefficient) reproduces the
    static-rt60 program exactly — the domain-randomization path changes only
    how beta arrives, not the math."""
    want = dsp.generate_rir(
        jnp.asarray(SOURCE, jnp.float32), jnp.asarray(RECEIVER, jnp.float32),
        room=ROOM, nsample=NSAMPLE, fs=FS, rt60=0.4, chunk=256,
    )
    beta = dsp.beta_from_rt60(ROOM, 0.4)
    got = dsp.generate_rir(
        jnp.asarray(SOURCE, jnp.float32), jnp.asarray(RECEIVER, jnp.float32),
        room=ROOM, nsample=NSAMPLE, fs=FS, beta_traced=jnp.float32(beta), chunk=256,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-7)
    # traced Sabine == static Sabine
    np.testing.assert_allclose(
        float(dsp.beta_from_rt60_traced(ROOM, jnp.float32(0.4))), beta, rtol=1e-6
    )


def test_batch_per_sample_rt60_matches_static_rows():
    """generate_rir_batch(rt60_traced=[...]) gives each source its own T60,
    row-equal to individually generated static-rt60 RIRs."""
    rng = np.random.default_rng(11)
    sources = jnp.asarray(
        RECEIVER[None, :] + rng.uniform(-1.0, 1.0, (3, 3)) * 0.5, jnp.float32
    )
    rt60s = [0.25, 0.4, 0.55]
    got = dsp.generate_rir_batch(
        sources, jnp.asarray(RECEIVER, jnp.float32),
        rt60_traced=jnp.asarray(rt60s, jnp.float32),
        room=ROOM, nsample=NSAMPLE, fs=FS, chunk=256,
    )
    for i, t in enumerate(rt60s):
        want = dsp.generate_rir(
            sources[i], jnp.asarray(RECEIVER, jnp.float32),
            room=ROOM, nsample=NSAMPLE, fs=FS, rt60=t, chunk=256,
        )
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(want), rtol=1e-4, atol=1e-6
        )


def test_traced_beta_excludes_static():
    with pytest.raises(ValueError, match="beta_traced"):
        dsp.generate_rir(
            jnp.zeros(3), jnp.zeros(3), room=ROOM, nsample=64, fs=FS,
            rt60=0.4, beta_traced=jnp.float32(0.5),
        )
    with pytest.raises(ValueError, match="rt60_traced"):
        dsp.generate_rir_batch(
            jnp.zeros((1, 3)), jnp.zeros(3), rt60_traced=jnp.ones(1),
            room=ROOM, nsample=64, fs=FS, rt60=0.4,
        )


def test_image_culling_is_exact():
    """Static lattice culling (round-3 OTF optimization) changes nothing for
    in-room positions beyond f32 accumulation order (every culled image had
    exactly zero gain; regrouping the scan chunks moves the last bit):
    culled ~= unculled to 1e-7 absolute across several sources, including
    near-wall ones."""
    rng = np.random.default_rng(21)
    room = np.asarray(ROOM)
    sources = np.concatenate(
        [
            rng.uniform(0.05, 0.95, (4, 3)) * room[None, :],
            np.array([[0.01, 0.01, 0.01], [3.99, 4.99, 2.99]]),  # corners
        ]
    )
    for s in sources:
        kw = dict(room=ROOM, nsample=NSAMPLE, fs=FS, rt60=0.4, chunk=512)
        a = dsp.generate_rir(jnp.asarray(s, jnp.float32), jnp.asarray(RECEIVER, jnp.float32), cull=True, **kw)
        b = dsp.generate_rir(jnp.asarray(s, jnp.float32), jnp.asarray(RECEIVER, jnp.float32), cull=False, **kw)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7, rtol=0, err_msg=str(s)
        )


def test_image_culling_reduces_lattice():
    from acoustic_locating_vq_vae_tpu.dsp.rir import _image_grid

    full = _image_grid(ROOM, 6400, 16000.0, 340.0, cull=False)
    culled = _image_grid(ROOM, 6400, 16000.0, 340.0, cull=True)
    assert culled.shape[0] < 0.6 * full.shape[0]  # ~1.9x fewer at reference scale


def test_geometry_boxed_culling_is_exact():
    """Round-4 geometry-boxed culling: with source/receiver boxes matching
    the task geometry (fixed receiver, source on a bounded circle at fixed
    height — data/synth.py geometry_boxes), the boxed cull equals the
    unculled synthesis to f32 accumulation order for every in-box position,
    including the radius boundary."""
    from acoustic_locating_vq_vae_tpu.data import DatasetConfig, geometry_boxes

    cfg = DatasetConfig()  # geometry fields only; nsample/fs come from kw
    r_hi = 1.0
    sb, rb = geometry_boxes(cfg, r_hi)
    kw = dict(room=ROOM, nsample=NSAMPLE, fs=FS, rt60=0.4, chunk=512)
    recv = jnp.asarray(RECEIVER, jnp.float32)
    for theta in np.linspace(-np.pi, np.pi, 7):
        for r in (0.15, r_hi):
            s = np.minimum(
                RECEIVER + np.array([r * np.cos(theta), r * np.sin(theta), 1.0]),
                np.asarray(ROOM),
            )
            a = dsp.generate_rir(
                jnp.asarray(s, jnp.float32), recv, cull=True,
                source_box=sb, receiver_box=rb, **kw,
            )
            b = dsp.generate_rir(jnp.asarray(s, jnp.float32), recv, cull=False, **kw)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-7, rtol=0,
                err_msg=f"theta={theta} r={r}",
            )


def test_geometry_boxed_culling_tightens_lattice():
    """At reference scale the geometry boxes cull ~10% more lattice rows than
    the whole-room cull AND shrink the per-row static distance intervals ~6x
    (the intervals drive the K-local block span of the accumulation)."""
    from acoustic_locating_vq_vae_tpu.data import DatasetConfig, geometry_boxes
    from acoustic_locating_vq_vae_tpu.dsp.rir import _image_grid_bounds

    cfg = DatasetConfig()
    sb, rb = geometry_boxes(cfg, 1.45)
    plain, lb_p, ub_p = _image_grid_bounds(ROOM, 6400, 16000.0, 340.0, cull=True)
    boxed, lb_b, ub_b = _image_grid_bounds(
        ROOM, 6400, 16000.0, 340.0, cull=True, source_box=sb, receiver_box=rb
    )
    assert boxed.shape[0] < 0.95 * plain.shape[0]
    assert float(np.mean(ub_b - lb_b)) < 0.3 * float(np.mean(ub_p - lb_p))

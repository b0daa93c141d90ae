"""Image-source-method room impulse response synthesis as a batched XLA op.

TPU-native re-design of the one native (C++) component the reference uses:
the ``rir-generator`` pip package (reference pyproject.toml:44), called as
``rir.generate(c, fs, r, s, L, reverberation_time, nsample)`` at
scripts/genereate_dataset.py:21-29. That C++ core (Habets' image-source
method) loops serially over ~4e5 image sources and scatter-adds a 128-tap
Hann-windowed-sinc fractional delay into the impulse response.

Here the same math is re-shaped for the MXU/VPU:

  * the image grid is a static (room, nsample)-dependent enumeration, chunked
    under ``lax.scan``;
  * each image's 128 active taps live inside a 2*Tw-wide aligned window, so
    accumulation becomes ``one_hot(block_id) @ tap_values`` — a dense matmul
    on the MXU instead of a serialized scatter;
  * the post high-pass IIR runs as a parallel associative scan
    (:func:`..dsp.filters.highpass_habets`).

``vmap`` over sources gives whole-batch RIR synthesis in one compiled
program; a ``method="scatter"`` segment-sum variant cross-checks the matmul
formulation in tests, and a third independent C++ implementation lives in
``native/`` for host-side golden values.

Algorithmic parity notes (vs the Habets core):
  * reflection coefficient from T60 via Sabine: beta = sqrt(1 - 24 V ln10 /
    (c S T60)), uniform across the 6 walls;
  * image count per axis: n_i = ceil(nsample / (2 * L_i / cTs));
  * tap value at output index p is gain * 0.5*(1+cos(2*pi*(p-d)/Tw)) *
    sinc(p-d) for p in [floor(d)-Tw/2+1, floor(d)+Tw/2], Tw = 2*round(0.004*fs);
  * gain = prod_walls beta^|..| / (4*pi*d*cTs); images with floor(d) >= nsample
    are dropped;
  * 100 Hz high-pass filter applied by default.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .filters import highpass_habets

__all__ = [
    "beta_from_rt60",
    "beta_from_rt60_traced",
    "generate_rir",
    "generate_rir_batch",
]


def beta_from_rt60(room: Sequence[float], rt60: float, c: float = 340.0) -> float:
    """Uniform wall reflection coefficient from Sabine's formula (Habets core)."""
    lx, ly, lz = float(room[0]), float(room[1]), float(room[2])
    volume = lx * ly * lz
    surface = 2.0 * (lx * ly + lx * lz + ly * lz)
    alpha = 24.0 * volume * math.log(10.0) / (c * surface * rt60)
    if alpha > 1.0:
        raise ValueError(
            f"T60={rt60} is too small for room {room!r} (Sabine absorption {alpha:.3f} > 1)"
        )
    return math.sqrt(1.0 - alpha)


def beta_from_rt60_traced(room: Sequence[float], rt60: jax.Array, c: float = 340.0) -> jax.Array:
    """Traced Sabine beta: like :func:`beta_from_rt60` but ``rt60`` is a jax
    array (per-sample domain randomization inside jit — round-3 item). Out of
    Sabine validity (absorption > 1) the value is clamped to 0 instead of
    raising (data-dependent errors cannot be raised under jit); callers
    should keep their T60 range physically valid for the room."""
    lx, ly, lz = float(room[0]), float(room[1]), float(room[2])
    volume = lx * ly * lz
    surface = 2.0 * (lx * ly + lx * lz + ly * lz)
    alpha = 24.0 * volume * math.log(10.0) / (c * surface * jnp.asarray(rt60, jnp.float32))
    return jnp.sqrt(jnp.maximum(1.0 - alpha, 0.0))


def _image_grid_bounds(
    room: Sequence[float], nsample: int, fs: float, c: float, cull: bool = True,
    source_box=None, receiver_box=None,
):
    """Static enumeration of the image-source lattice plus per-image static
    distance BOUNDS, sorted by static distance (numpy, trace time).

    ``cull=True`` drops lattice rows that can NEVER land inside the
    ``nsample``-tap window for ANY source/receiver inside the room (interval
    arithmetic on pos_i = ±s_i − r_i + 2 m_i L_i with s_i, r_i ∈ [0, L_i]):
    the kept set is exact — every dynamically contributing image survives —
    but the corner of the L∞ lattice box beyond the L2 horizon (~47% of rows
    for the reference room) is removed at trace time, cutting the scan's
    image count and therefore RIR synthesis time by ~2x.

    ``source_box`` / ``receiver_box`` (round 4): optional per-axis position
    bounds ``((lox, loy, loz), (hix, hiy, hiz))`` in METERS that replace the
    whole-room intervals in that interval arithmetic. The localization task's
    geometry is a FIXED receiver and a source on a bounded annulus at fixed
    height (dsp/specs.py source_coordinates), so its boxes are far tighter
    than the room: more horizon-shell rows cull away and the per-chunk block
    ranges (K) shrink. Exact iff the actual traced positions lie inside the
    boxes — callers own that invariant (data/synth.py derives boxes from the
    same config it draws positions from).

    The returned images are SORTED by the midpoint of their [lb, ub]
    distance interval: a chunk of consecutive sorted images then spans only
    a small static range of output blocks, so the accumulation contraction
    can be K-local instead of whole-output (see ``generate_rir``). Returns
    ``(images (N, 6) int32, dist_lb (N,), dist_ub (N,))`` — the bounds hold
    for ANY source/receiver inside the boxes (default: the room), so they
    are valid for traced positions.
    """
    cTs = c / fs
    counts = [int(math.ceil(nsample / (2.0 * (dim / cTs)))) for dim in room]
    n1, n2, n3 = counts
    mx = np.arange(-n1, n1 + 1)
    my = np.arange(-n2, n2 + 1)
    mz = np.arange(-n3, n3 + 1)
    bits = np.arange(2)
    grid = np.meshgrid(mx, my, mz, bits, bits, bits, indexing="ij")
    flat = [g.reshape(-1) for g in grid]
    # (N, 6): mx, my, mz, q, j, k
    images = np.stack(flat, axis=1).astype(np.int32)
    L = np.asarray(room, np.float64) / cTs  # room in sample units
    m = images[:, 0:3].astype(np.float64)
    q = images[:, 3:6].astype(np.float64)
    center = 2.0 * m * L[None, :]

    def _box(box):
        if box is None:
            return np.zeros(3), L.copy()
        lo = np.asarray(box[0], np.float64) / cTs
        hi = np.asarray(box[1], np.float64) / cTs
        if lo.shape != (3,) or hi.shape != (3,) or np.any(lo > hi):
            raise ValueError(f"box must be ((lox,loy,loz),(hix,hiy,hiz)) with lo<=hi, got {box!r}")
        return lo, hi

    s_lo, s_hi = _box(source_box)
    r_lo, r_hi = _box(receiver_box)
    # q=0: pos_i = s_i - r_i + 2 m_i L_i  in [c + s_lo - r_hi, c + s_hi - r_lo]
    # q=1: pos_i = -s_i - r_i + 2 m_i L_i in [c - s_hi - r_hi, c - s_lo - r_lo]
    lo = np.where(q == 0, center + (s_lo - r_hi), center - (s_hi + r_hi))
    hi = np.where(q == 0, center + (s_hi - r_lo), center - (s_lo + r_lo))
    # min |pos_i| over the interval: 0 if it straddles 0, else nearest end
    min_abs = np.where((lo <= 0.0) & (hi >= 0.0), 0.0, np.minimum(np.abs(lo), np.abs(hi)))
    max_abs = np.maximum(np.abs(lo), np.abs(hi))
    dist_lb = np.sqrt(np.sum(min_abs**2, axis=1))
    dist_ub = np.sqrt(np.sum(max_abs**2, axis=1))
    if cull:
        # dynamic keep is floor(dist) < nsample i.e. dist < nsample; a lower
        # bound >= nsample can never contribute
        keep = dist_lb < nsample
        images, dist_lb, dist_ub = images[keep], dist_lb[keep], dist_ub[keep]
    order = np.argsort(0.5 * (dist_lb + dist_ub), kind="stable")
    return images[order], dist_lb[order], dist_ub[order]


def _image_grid(
    room: Sequence[float], nsample: int, fs: float, c: float, cull: bool = True
):
    """Back-compat wrapper: the (sorted) image lattice without bounds."""
    return _image_grid_bounds(room, nsample, fs, c, cull=cull)[0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "room", "nsample", "fs", "c", "rt60", "beta", "order", "tw", "hp",
        "method", "chunk", "cull", "block", "source_box", "receiver_box",
    ),
)
def generate_rir(
    source: jax.Array,
    receiver: jax.Array,
    *,
    room: tuple,
    nsample: int,
    fs: float,
    c: float = 340.0,
    rt60: Optional[float] = None,
    beta: Optional[tuple] = None,
    beta_traced: Optional[jax.Array] = None,
    order: int = -1,
    tw: Optional[int] = None,
    hp: bool = True,
    method: str = "block_matmul",
    chunk: int = 16384,
    cull: bool = True,
    block: int = 32,
    source_box: Optional[tuple] = None,
    receiver_box: Optional[tuple] = None,
) -> jax.Array:
    """Generate one RIR. ``source``/``receiver`` are traced (3,) positions in
    meters; the room geometry / sampling config are static. Returns (nsample,).

    ``cull``: statically drop lattice images that cannot reach the window for
    any IN-ROOM source/receiver (see :func:`_image_grid`) — exact for in-room
    positions (which :func:`..dsp.specs.source_coordinates` guarantees by
    clipping); set False for out-of-room experiments.

    ``source_box`` / ``receiver_box``: optional STATIC hashable per-axis
    position bounds ``((lox, loy, loz), (hix, hiy, hiz))`` in meters that
    tighten the cull's interval arithmetic beyond the whole room (round 4;
    see :func:`_image_grid_bounds`). Culling-only: the output is exact iff
    the traced positions actually lie inside the boxes — out-of-box
    positions silently lose taps. ``data/synth.py`` derives boxes from the
    same geometry config it draws positions from, which keeps the invariant
    by construction.

    Drop-in semantics of ``rir.generate(c, fs, r, s, L, reverberation_time,
    nsample)`` (genereate_dataset.py:21-29) with omnidirectional microphone.

    ``beta_traced``: TRACED scalar or (6,) reflection coefficient(s)
    overriding the static ``rt60``/``beta`` — the image grid depends only on
    the (static) room, so per-sample reverberation can vary inside one jitted
    program (domain randomization; use :func:`beta_from_rt60_traced` to map a
    traced T60 to beta).

    ``block``: accumulation-block size ``g`` of the block_matmul method (must
    divide ``tw``; falls back to ``tw`` otherwise). Each image's tw active
    taps land inside a (g + tw)-wide g-aligned window, so the per-image tap
    matrix is (chunk, g+tw) — smaller g means less VPU work per image (the
    round-4 profile showed the tap-matrix elementwise fusion IS the whole
    cost; g=32 cut it 256→160 columns for ~2x end-to-end). The block-sum
    contraction stays cheap at any g because the statically distance-sorted
    image chunks (:func:`_image_grid_bounds`) each touch only K << n_blocks
    consecutive blocks: a (K, chunk) x (chunk, g+tw) matmul placed with one
    dynamic slice per chunk.
    """
    if beta_traced is not None:
        if rt60 is not None or beta is not None:
            raise ValueError("beta_traced excludes the static rt60 / beta")
        bt = jnp.asarray(beta_traced, jnp.float32)
        beta_vals = jnp.broadcast_to(bt, (6,)) if bt.ndim <= 1 else None
        if beta_vals is None or bt.shape not in ((), (6,)):
            raise ValueError(f"beta_traced must be scalar or (6,), got {bt.shape}")
    else:
        if (rt60 is None) == (beta is None):
            raise ValueError("specify exactly one of rt60 / beta / beta_traced")
        if beta is None:
            beta_vals = (beta_from_rt60(room, rt60, c),) * 6
        elif isinstance(beta, (int, float)):
            beta_vals = (float(beta),) * 6
        else:
            beta_vals = tuple(float(b) for b in beta)
            if len(beta_vals) != 6:
                raise ValueError("beta must be scalar or length-6")

    if tw is None:
        tw = 2 * int(round(0.004 * fs))  # 8 ms FIR, 128 taps at 16 kHz

    cTs = c / fs
    s = jnp.asarray(source, jnp.float32) / cTs
    r = jnp.asarray(receiver, jnp.float32) / cTs
    L = jnp.asarray(np.asarray(room, np.float64) / cTs, jnp.float32)
    betas = jnp.asarray(beta_vals, jnp.float32)

    images_np, dist_lb, dist_ub = _image_grid_bounds(
        room, nsample, fs, c, cull=cull,
        source_box=source_box, receiver_box=receiver_box,
    )
    n_img = images_np.shape[0]
    pad = (-n_img) % chunk
    if pad:
        # Padding rows marked invalid via a sentinel q=-1 (masked below);
        # their static bounds reuse the last real row's so chunk block
        # spans stay tight (their dynamic contribution is zeroed anyway).
        filler = np.zeros((pad, 6), np.int32)
        filler[:, 3] = -1
        images_np = np.concatenate([images_np, filler], axis=0)
        dist_lb = np.concatenate([dist_lb, np.full(pad, dist_lb[-1])])
        dist_ub = np.concatenate([dist_ub, np.full(pad, dist_ub[-1])])
    n_chunks = images_np.shape[0] // chunk
    images = jnp.asarray(images_np.reshape(n_chunks, chunk, 6))

    half = tw // 2

    def image_gains(img):
        """img: (chunk, 6) -> (dist, gain) with invalid rows zeroed."""
        m = img[:, 0:3].astype(jnp.float32)  # (chunk, 3)
        qjk = img[:, 3:6].astype(jnp.float32)
        valid = img[:, 3] >= 0
        qjk = jnp.maximum(qjk, 0.0)
        pos = (1.0 - 2.0 * qjk) * s - r + 2.0 * m * L  # (chunk, 3) in samples
        dist = jnp.sqrt(jnp.sum(pos * pos, axis=1))
        refl = (
            betas[0] ** jnp.abs(m[:, 0] - qjk[:, 0]) * betas[1] ** jnp.abs(m[:, 0])
            * betas[2] ** jnp.abs(m[:, 1] - qjk[:, 1]) * betas[3] ** jnp.abs(m[:, 1])
            * betas[4] ** jnp.abs(m[:, 2] - qjk[:, 2]) * betas[5] ** jnp.abs(m[:, 2])
        )
        gain = refl / (4.0 * jnp.pi * jnp.maximum(dist, 1e-8) * cTs)
        fdist = jnp.floor(dist)
        keep = valid & (fdist < nsample)
        if order >= 0:
            refl_count = (
                jnp.abs(2.0 * m[:, 0] - qjk[:, 0])
                + jnp.abs(2.0 * m[:, 1] - qjk[:, 1])
                + jnp.abs(2.0 * m[:, 2] - qjk[:, 2])
            )
            keep = keep & (refl_count <= order)
        gain = jnp.where(keep, gain, 0.0)
        return dist, gain

    if method == "block_matmul":
        if tw % 2:
            raise ValueError(
                f"block_matmul requires even tw (got {tw}): the hoisted tap "
                "parity assumes (-1)^p == (-1)^n within a window; use "
                "method='scatter' for odd tap counts"
            )
        g = block if (block > 0 and tw % block == 0 and block % 2 == 0) else tw
        W = g + tw  # window width: tw active taps at offset < g
        f_over = W // g  # overlap pieces per window
        PAD = tw  # padded-domain shift (start_p >= 0 for any dist >= 0)

        # Per-chunk static block range from the sorted grid's distance
        # bounds: chunk c's images can only touch blocks
        # [base_c, base_c + K): the block-sum contraction is (K, chunk) @
        # (chunk, W) instead of (n_blocks, chunk) @ (chunk, W) — the
        # round-4 profile showed the old whole-output contraction +
        # 2tw-wide tap matrix were ~2x avoidable work.
        def _blk_of(d):
            return (np.floor(d) - half + 1 + PAD) // g

        lbc = dist_lb.reshape(n_chunks, chunk)
        ubc = dist_ub.reshape(n_chunks, chunk)
        base_blk = _blk_of(lbc.min(axis=1)).astype(np.int32)
        K = int((_blk_of(ubc.max(axis=1)) - base_blk).max() + 1)
        n_gb = int(_blk_of(float(nsample - 1)) + K + f_over + 2)
        base_j = jnp.asarray(base_blk)

        # Transcendental hoisting: taps sit at INTEGER positions p, so with
        # the window-LOCAL coordinate e = d - (blk*g - PAD) (t = n - e):
        #   sin(pi*t)            = -(-1)^n * sin(pi*e)
        #   cos(2*pi*t/Tw)       = cos(2*pi*n/Tw)cos(2*pi*e/Tw)
        #                        + sin(2*pi*n/Tw)sin(2*pi*e/Tw)
        # ((-1)^(blk*g - PAD) == 1 for even g; parity(floor e) ==
        # parity(floor d) likewise). That turns 3 transcendentals per
        # (image, tap) — the measured bottleneck, ~100M evals per 32-RIR
        # batch — into 3 per image, with exact range reduction (f32 sin/cos
        # of pi*d at d~6e3 loses ~1e-3; e mod Tw stays in [0, Tw)).
        n_rel_f = np.arange(W, dtype=np.float32)
        tapC = jnp.asarray(np.cos(2.0 * np.pi * n_rel_f / tw))[None, :]  # (1, W)
        tapS = jnp.asarray(np.sin(2.0 * np.pi * n_rel_f / tw))[None, :]
        tap_parity = jnp.asarray(
            np.where(np.arange(W) % 2 == 0, 1.0, -1.0).astype(np.float32)
        )[None, :]

        def body(acc, xs):
            img, base = xs
            dist, gain = image_gains(img)
            start_p = jnp.floor(dist).astype(jnp.int32) - half + 1 + PAD
            blk = start_p // g  # (chunk,)
            off = start_p - blk * g  # in [0, g)
            n_rel = jnp.arange(W, dtype=jnp.int32)[None, :]  # (1, W)
            p_abs = blk[:, None] * g + n_rel - PAD  # unpadded index
            t = p_abs.astype(jnp.float32) - dist[:, None]
            active = (n_rel >= off[:, None]) & (n_rel < off[:, None] + tw)
            fdist = jnp.floor(dist)
            frac = dist - fdist  # [0, 1)
            e = dist - (blk * g - PAD).astype(jnp.float32)  # window-local d
            emod = e - tw * jnp.floor(e / tw)  # e mod Tw, [0, Tw)
            fd_parity = (1.0 - 2.0 * jnp.mod(fdist, 2.0))[:, None]
            cos_e = jnp.cos(2.0 * jnp.pi * emod / tw)[:, None]  # (chunk, 1)
            sin_e = jnp.sin(2.0 * jnp.pi * emod / tw)[:, None]
            sin_pe = fd_parity * jnp.sin(jnp.pi * frac)[:, None]  # == sin(pi e)
            window = 0.5 * (1.0 + tapC * cos_e + tapS * sin_e)  # == 0.5(1+cos(2pi t/Tw))
            sin_pt = -tap_parity * sin_pe  # == sin(pi t)
            sinc = jnp.where(t == 0.0, 1.0, sin_pt / (jnp.pi * t + 1e-30))
            vals = jnp.where(active, gain[:, None] * window * sinc, 0.0)  # (chunk, W)
            # K-local block sum: padding rows (gain 0) may clip out of the
            # chunk's static range; real rows are in range by construction.
            loc = jnp.clip(blk - base, 0, K - 1)
            onehot = jax.nn.one_hot(loc, K, dtype=vals.dtype)  # (chunk, K)
            local = jax.lax.dot_general(onehot, vals, (((0,), (0,)), ((), ())))
            cur = jax.lax.dynamic_slice(acc, (base, 0), (K, W))
            return jax.lax.dynamic_update_slice(acc, cur + local, (base, 0)), None

        acc0 = jnp.zeros((n_gb, W), jnp.float32)
        out_blocks, _ = jax.lax.scan(body, acc0, (images, base_j))
        # Fold the f_over overlapping g-wide pieces of every window:
        # padded[(b + r) * g + j] += ob[b, r * g + j]
        pieces = out_blocks.reshape(n_gb, f_over, g)
        folded = jnp.zeros((n_gb + f_over - 1, g), jnp.float32)
        for r in range(f_over):
            folded = folded.at[r : r + n_gb].add(pieces[:, r])
        padded = folded.reshape(-1)
        imp = padded[PAD : PAD + nsample]

    elif method == "scatter":

        def body(acc, img):
            dist, gain = image_gains(img)
            start = jnp.floor(dist).astype(jnp.int32) - half + 1
            n_rel = jnp.arange(tw, dtype=jnp.int32)[None, :]
            p_abs = start[:, None] + n_rel  # (chunk, tw) unpadded index
            t = p_abs.astype(jnp.float32) - dist[:, None]
            window = 0.5 * (1.0 + jnp.cos(2.0 * jnp.pi * t / tw))
            sinc = jnp.where(t == 0.0, 1.0, jnp.sin(jnp.pi * t) / (jnp.pi * t + 1e-30))
            vals = (gain[:, None] * window * sinc).reshape(-1)
            idx = jnp.clip(p_abs + tw, 0, nsample + 2 * tw - 1).reshape(-1)
            vals = jnp.where((p_abs.reshape(-1) >= -tw), vals, 0.0)
            return acc.at[idx].add(vals), None

        acc0 = jnp.zeros(nsample + 2 * tw, jnp.float32)
        padded, _ = jax.lax.scan(body, acc0, images)
        imp = padded[tw : tw + nsample]
    else:
        raise ValueError(f"unknown method {method!r}")

    if hp:
        imp = highpass_habets(imp, int(fs))
    return imp


def generate_rir_batch(
    sources: jax.Array,
    receiver: jax.Array,
    rt60_traced: Optional[jax.Array] = None,
    **kwargs,
) -> jax.Array:
    """vmap of :func:`generate_rir` over a (B, 3) batch of source positions.

    ``rt60_traced``: optional (B,) per-sample reverberation times (traced) —
    each source gets its own Sabine beta inside the one compiled program
    (domain randomization). Excludes the static ``rt60``/``beta`` kwargs.
    """
    if rt60_traced is not None:
        if "rt60" in kwargs or "beta" in kwargs or "beta_traced" in kwargs:
            raise ValueError("rt60_traced excludes the static rt60 / beta kwargs")
        room = kwargs["room"]
        c = kwargs.get("c", 340.0)
        betas = beta_from_rt60_traced(room, rt60_traced, c)  # (B,)
        fn = functools.partial(generate_rir, receiver=receiver, **kwargs)
        return jax.vmap(lambda s, b: fn(s, beta_traced=b))(sources, betas)
    fn = functools.partial(generate_rir, receiver=receiver, **kwargs)
    return jax.vmap(fn)(sources)

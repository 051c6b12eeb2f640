"""Multi-scalar multiplication (Pippenger) on TPU.

The reference `best_multiexp` (halo2_proofs/src/arithmetic.rs:13-159) is a
per-thread serial Pippenger with scatter-into-buckets — a shape TPUs can't
run.  The TPU-native redesign:

  window digits (c = 16, one per scalar limb)
    -> per window (sequential lax.map, so one compiled body):
       sort point indices by digit            (XLA sort, lane-parallel)
       segmented inclusive scan of points     (Hillis-Steele over log2 n
                                               steps of the unified Jacobian
                                               add — branch-free combiner)
       segment tails scattered into 2^c buckets
       suffix-sum of buckets + log-shift total = window sum
    -> 2^{16w}-weighted window fold on host (16 tiny point ops)

All group math is the branch-free Jacobian arithmetic in curves/device.py;
identity = Z=0 lanes makes every mask a select.  Multi-chip: shard the point
axis, psum the (tiny) per-window bucket sums — see parallel/.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import device as PD
from ..curves import host as CH
from ..fields import device as D
from ..fields import host as H
from ..fields.device import FQ, NLIMB, U32

C_BITS = 16                 # window size = one 16-bit scalar limb
N_WINDOWS = 16              # 256 / 16
HOST_THRESHOLD = 64         # below this, the host MSM is faster than compile


def _scalars_to_digits(scalars: Sequence[int]) -> np.ndarray:
    """(16, n) uint32: digit w of scalar i = limb w (base 2^16)."""
    n = len(scalars)
    out = np.zeros((N_WINDOWS, n), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s %= H.FR_MOD
        for w in range(N_WINDOWS):
            out[w, i] = (s >> (16 * w)) & 0xFFFF
    return out


def _ceil_log2(n: int) -> int:
    return max(1, (n - 1).bit_length())


@functools.partial(jax.jit, static_argnums=(2,))
def _window_sums(points, digits, n: int):
    """points: (X, Y, Z) each (16, n); digits: (16, n) uint32.
    Returns (16_windows, 3, 16, 1) window sums."""
    X, Y, Z = points
    log_n = _ceil_log2(n)

    def one_window(d):
        order = jnp.argsort(d)
        ds = jnp.take(d, order)
        pt = (jnp.take(X, order, axis=1), jnp.take(Y, order, axis=1), jnp.take(Z, order, axis=1))
        # zero-digit lanes contribute nothing: mask them to identity
        live = ds != 0
        pt = PD.select_point(live, pt, PD.identity_like((n,)))

        # segmented inclusive scan (Hillis-Steele): acc[i] = sum of points
        # j <= i in i's digit-segment
        idx = jnp.arange(n, dtype=jnp.int32)

        def step(t, carry):
            acc, seg = carry
            offset = jnp.int32(1) << t
            sh = tuple(jnp.roll(a, offset, axis=1) for a in acc)
            sh_seg = jnp.roll(seg, offset)
            combined = PD.point_add(sh, acc)
            use = (idx >= offset) & (sh_seg == seg)
            acc = PD.select_point(use, combined, acc)
            return (acc, seg)

        acc, _ = jax.lax.fori_loop(0, log_n, step, (pt, ds))

        # segment tails -> buckets
        nxt = jnp.roll(ds, -1)
        is_tail = (idx == n - 1) | (ds != nxt)
        # scatter segment tails into buckets; non-tail lanes are routed to
        # bucket 0 (discarded below) with a zero payload, so collisions there
        # are all-equal writes
        tgt = jnp.where(is_tail, ds.astype(jnp.int32), jnp.int32(0))
        zero = jnp.zeros_like(acc[0])
        bX = D.zeros((1 << C_BITS,), FQ).at[:, tgt].set(jnp.where(is_tail[None, :], acc[0], zero))
        bY = D.zeros((1 << C_BITS,), FQ).at[:, tgt].set(jnp.where(is_tail[None, :], acc[1], zero))
        bZ = D.zeros((1 << C_BITS,), FQ).at[:, tgt].set(jnp.where(is_tail[None, :], acc[2], zero))
        # bucket 0 is skipped entirely
        ident = PD.identity_like((1 << C_BITS,))
        bucket0 = jnp.arange(1 << C_BITS) == 0
        B = PD.select_point(bucket0 | D.is_zero(bZ), ident, (bX, bY, bZ))

        # suffix sums R_j = sum_{b >= j} B_b (reverse Hillis-Steele scan)
        m = 1 << C_BITS
        bidx = jnp.arange(m, dtype=jnp.int32)

        def sstep(t, acc):
            offset = jnp.int32(1) << t
            sh = tuple(jnp.roll(a, -offset, axis=1) for a in acc)
            combined = PD.point_add(sh, acc)
            use = bidx < (m - offset)
            return PD.select_point(use, combined, acc)

        R = jax.lax.fori_loop(0, C_BITS, sstep, B)
        # window sum = sum_{j>=1} R_j ; zero out R_0 then total-sum by shifts
        R = PD.select_point(bidx == 0, PD.identity_like((m,)), R)

        def tstep(t, acc):
            offset = jnp.int32(1) << t
            sh = tuple(jnp.roll(a, -offset, axis=1) for a in acc)
            combined = PD.point_add(sh, acc)
            use = bidx < (m - offset)
            return PD.select_point(use, combined, acc)

        T = jax.lax.fori_loop(0, C_BITS, tstep, R)
        return jnp.stack([T[0][:, 0], T[1][:, 0], T[2][:, 0]])  # (3, 16)

    return jax.lax.map(one_window, digits)


def msm_device(scalars: Sequence[int], points, digits: Optional[np.ndarray] = None):
    """Pippenger MSM on device; points = host affine list or device PointArray."""
    n = len(scalars) if digits is None else digits.shape[1]
    if digits is None:
        digits = _scalars_to_digits(scalars)
    if not isinstance(points, tuple):
        points = PD.pack_affine(points)
    sums = _window_sums(points, jnp.asarray(digits), n)
    sums = np.asarray(jax.device_get(sums))  # (16, 3, 16)
    total = None
    from ..fields.host import FQ_MOD, inv_mod
    for w in range(N_WINDOWS - 1, -1, -1):
        limbs = sums[w]
        x = sum(int(limbs[0][i]) << (16 * i) for i in range(NLIMB))
        y = sum(int(limbs[1][i]) << (16 * i) for i in range(NLIMB))
        z = sum(int(limbs[2][i]) << (16 * i) for i in range(NLIMB))
        # Montgomery -> standard
        rinv = pow(FQ.r, FQ.p - 2, FQ.p)
        x, y, z = (x * rinv % FQ.p, y * rinv % FQ.p, z * rinv % FQ.p)
        if total is not None:
            for _ in range(C_BITS):
                total = CH.g1_add(total, total)
        if z != 0:
            zi = inv_mod(z, FQ_MOD)
            zi2 = zi * zi % FQ_MOD
            pt = (x * zi2 % FQ_MOD, y * zi2 * zi % FQ_MOD)
            total = CH.g1_add(total, pt)
    return total


def msm_host(scalars: Sequence[int], points) -> CH.G1Affine:
    """Host Pippenger (c=8) — fast enough for small commitments and the
    oracle for the device path."""
    n = len(scalars)
    if n == 0:
        return None
    c = 8 if n >= 32 else 4
    nw = (256 + c - 1) // c
    total = None
    for w in range(nw - 1, -1, -1):
        if total is not None:
            for _ in range(c):
                total = CH.g1_add(total, total)
        buckets: dict = {}
        for s, pt in zip(scalars, points):
            if pt is None:
                continue
            d = ((s % H.FR_MOD) >> (c * w)) & ((1 << c) - 1)
            if d:
                buckets[d] = CH.g1_add(buckets.get(d), pt) if d in buckets else pt
        run = None
        acc = None
        for d in range(max(buckets) if buckets else 0, 0, -1):
            run = CH.g1_add(run, buckets.get(d))
            acc = CH.g1_add(acc, run)
        total = CH.g1_add(total, acc)
    return total


def msm(scalars: Sequence[int], points) -> CH.G1Affine:
    """Dispatch: tiny MSMs on host, big ones on the TPU."""
    if len(scalars) < HOST_THRESHOLD:
        return msm_host(scalars, points)
    return msm_device(scalars, points)

"""Pallas TPU kernels for the field layer.

First production kernel: tiled Montgomery multiplication.  The jnp limb
pipeline already fuses well under XLA; the Pallas version adds explicit
VMEM blocking (each grid step owns a (16, TILE) column tile, so the whole
multiply—including the 33-column deferred-carry scratch—stays on-chip) and
is the substrate the round-2 MSM bucket kernel builds on.

Falls back to the plain jnp kernel on platforms where Mosaic is unavailable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import device as D
from ..fields.device import FR, NLIMB, U32

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

TILE = 512


def _mont_mul_cols(a, b, ctx):
    """Montgomery product in pure column-list form — no .at[] updates, which
    Pallas TPU cannot lower (they become scatter-adds).  Same math as
    fields/device.mont_mul."""
    import numpy as np
    NL, MASKc, LB = D.NLIMB, D.MASK, D.LIMB_BITS
    al = [a[i] for i in range(NL)]
    bl = [b[i] for i in range(NL)]
    zero = jnp.zeros_like(al[0])
    t = [zero] * (2 * NL + 1)
    for i in range(NL):
        for j in range(NL):
            pij = al[i] * bl[j]
            t[i + j] = t[i + j] + (pij & MASKc)
            t[i + j + 1] = t[i + j + 1] + (pij >> LB)
    n0 = np.uint32(ctx.n0)
    pl = [np.uint32(int(x)) for x in ctx.p_limbs]
    for i in range(NL):
        m = (t[i] * n0) & MASKc
        for j in range(NL):
            mp = m * pl[j]
            t[i + j] = t[i + j] + (mp & MASKc)
            t[i + j + 1] = t[i + j + 1] + (mp >> LB)
        t[i + 1] = t[i + 1] + (t[i] >> LB)
    limbs, _ = D._carry_canonicalize(t[NL:2 * NL + 1], NL + 1)
    limbs = limbs[:NL]
    plc = [jnp.full_like(zero, x) for x in pl]
    d, _ = D._sub_limbs(limbs, plc)
    need_sub = D._geq(limbs, plc)
    return jnp.stack([jnp.where(need_sub, x, y) for x, y in zip(d, limbs)])


def _mont_mul_kernel(ctx):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = _mont_mul_cols(a_ref[...], b_ref[...], ctx)
    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_mont_mul(a: jnp.ndarray, b: jnp.ndarray, ctx=FR) -> jnp.ndarray:
    """(16, n) x (16, n) Montgomery product via a tiled Pallas kernel."""
    n = a.shape[1]
    if (not _HAVE_PALLAS or n % TILE != 0
            or jax.default_backend() not in ("tpu", "axon")):
        return D.mont_mul(a, b, ctx)
    grid = (n // TILE,)
    spec = pl.BlockSpec((NLIMB, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mont_mul_kernel(ctx),
        out_shape=jax.ShapeDtypeStruct((NLIMB, n), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
    )(a, b)


# ------------- fused MXU-NTT epilogue: digit planes -> limbs -> x tw --------
#
# The matmul-NTT (ops/mxu_ntt.py) spends ~60% of its wall-clock OUTSIDE the
# int8 systolic matmuls: regrouping the 32 int32 digit planes into 16-bit
# limbs (carry sweeps + 2^256-excess folds) and the per-level twiddle
# Montgomery multiply are separate VPU passes, each round-tripping the
# (16, n) state through HBM.  This kernel fuses them: one grid step owns a
# (32, BM, BX) plane tile in VMEM, regroups it to limbs, and Montgomery-
# multiplies by the matching twiddle tile before a single canonical write.
# The residual NTT level passes a broadcast scalar instead of twiddles
# (Montgomery-one to canonicalize, or 1/n for the inverse transform), so the
# final `_canonicalize` pass disappears as well.
#
# Matches mxu_ntt._planes_to_limbs + fields.device.mont_mul bit-for-bit
# (asserted on TPU in tests/test_mxu_ntt.py's equivalence suite via the
# byte-identical NTT outputs).

_NDIG = 32


def _sweep_cols(cols):
    out = []
    carry = jnp.zeros_like(cols[0])
    for j in range(NLIMB):
        v = cols[j] + carry
        out.append(v & D.MASK)
        carry = v >> D.LIMB_BITS
    return out, carry


def _planes_to_limbs_cols(planes, ctx):
    """List-form mirror of mxu_ntt._planes_to_limbs (no .at[] updates, which
    Pallas TPU cannot lower).  planes: 32 uint32 arrays; returns 16 limb
    columns in the relaxed (< 2^256) representation.  See the overflow
    discipline note in mxu_ntt._planes_to_limbs."""
    import numpy as np
    MASKc, LB = D.MASK, D.LIMB_BITS
    # byte columns C_q = sum_u (plane[q-u] >> 8u) & 0xFF
    C = []
    for q in range(_NDIG + 4):
        acc = None
        for u in range(4):
            pi = q - u
            if 0 <= pi < _NDIG:
                v = (planes[pi] >> (8 * u)) & 0xFF
                acc = v if acc is None else acc + v
        C.append(acc)
    cols = [C[2 * t] + (C[2 * t + 1] << 8) for t in range(NLIMB)]
    p = ctx.p
    excess = jnp.zeros_like(cols[0])
    for qi, q in enumerate((32, 33, 34)):
        h = C[_NDIG + qi]
        kq = (1 << (8 * q)) % p
        for j in range(NLIMB):
            prod = h * np.uint32((kq >> (LB * j)) & MASKc)
            cols[j] = cols[j] + (prod & MASKc)
            if j + 1 < NLIMB:
                cols[j + 1] = cols[j + 1] + (prod >> LB)
            else:
                excess = excess + (prod >> LB)
    limbs, carry = _sweep_cols(cols)
    excess = excess + carry
    for _ in range(5):
        cols = list(limbs)
        nxt = None
        for j in range(NLIMB):
            prod = excess * np.uint32((ctx.r >> (LB * j)) & MASKc)
            cols[j] = cols[j] + (prod & MASKc)
            if j + 1 < NLIMB:
                cols[j + 1] = cols[j + 1] + (prod >> LB)
            else:
                nxt = prod >> LB
        limbs, carry = _sweep_cols(cols)
        excess = nxt + carry
    return limbs


def _epilogue_kernel(ctx):
    def kernel(o_ref, m_ref, out_ref):
        planes = [o_ref[i].astype(jnp.uint32) for i in range(_NDIG)]
        limbs = jnp.stack(_planes_to_limbs_cols(planes, ctx))
        out_ref[...] = _mont_mul_cols(limbs, m_ref[...], ctx)
    return kernel


def _pick_bx(x: int) -> int:
    for bx in (512, 256, 128):
        if x % bx == 0:
            return bx
    return 0


def epilogue_supported(m: int, x: int) -> bool:
    return (_HAVE_PALLAS and m % 8 == 0 and _pick_bx(x) != 0
            and jax.default_backend() in ("tpu", "axon"))


def planes_to_limbs_mul(O: jnp.ndarray, mult: jnp.ndarray, ctx=FR,
                        mult_is_tile: bool = True,
                        mult_minor: int = 0) -> jnp.ndarray:
    """(32, M, X) int32 digit planes -> (16, M, X) canonical Montgomery limbs,
    multiplied by `mult` on the way out.

    mult_is_tile=True: mult is (16, M, X) (per-element twiddles).
    mult_is_tile=False: mult is (16, BM, BX) — one broadcast block reused by
    every grid step (scalar multiplier, e.g. Montgomery-one or 1/n).
    mult_minor=m1 > 0 (with mult_is_tile=True): mult is (16, M, m1) and the
    X axis is batch-major, x = b*m1 + t1, so grid column j reads twiddle
    block j % (m1//BX) — the (16, M, X) broadcast never touches HBM
    (a batched NTT level otherwise pays 16*M*X u32 of pure twiddle traffic,
    e.g. 256 MB at k=18 chunk=16)."""
    M, X = O.shape[1], O.shape[2]
    BM, BX = 8, _pick_bx(X)
    grid = (M // BM, X // BX)
    o_spec = pl.BlockSpec((_NDIG, BM, BX), lambda i, j: (0, i, j),
                          memory_space=pltpu.VMEM)
    if mult_minor:
        assert mult_is_tile and mult_minor % BX == 0 and \
            mult.shape == (NLIMB, M, mult_minor)
        nrep = mult_minor // BX
        m_spec = pl.BlockSpec((NLIMB, BM, BX), lambda i, j: (0, i, j % nrep),
                              memory_space=pltpu.VMEM)
    elif mult_is_tile:
        m_spec = pl.BlockSpec((NLIMB, BM, BX), lambda i, j: (0, i, j),
                              memory_space=pltpu.VMEM)
    else:
        m_spec = pl.BlockSpec((NLIMB, BM, BX), lambda i, j: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((NLIMB, BM, BX), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _epilogue_kernel(ctx),
        out_shape=jax.ShapeDtypeStruct((NLIMB, M, X), jnp.uint32),
        grid=grid,
        in_specs=[o_spec, m_spec],
        out_specs=out_spec,
    )(O, mult)


def broadcast_scalar_block(scalar_limbs: jnp.ndarray, x: int) -> jnp.ndarray:
    """(16,)- or (16,1)-shaped Montgomery scalar -> one (16, 8, BX) block for
    planes_to_limbs_mul(mult_is_tile=False)."""
    bx = _pick_bx(x)
    return jnp.broadcast_to(scalar_limbs.reshape(NLIMB, 1, 1), (NLIMB, 8, bx))

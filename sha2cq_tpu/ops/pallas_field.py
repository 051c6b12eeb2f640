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

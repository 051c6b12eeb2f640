"""Can the *pairwise* Montgomery multiply be made MXU-shaped?  (VERDICT r3
item 5 — settle the device-MSM question with data.)

The MXU multiplies matrices: every output must be a CONTRACTION with a
SHARED operand.  The NTT qualifies (twiddle matrix shared by all lanes;
that is what took ops/mxu_ntt.py 29x past the CPU).  A Pippenger point add
does not: each lane multiplies two field elements that BOTH vary per lane
(x1*z2^2, lambda*lambda, ...).  Digit-decomposed, the product digit
c[i,k] = sum_d a[i,d] * b[i,k-d] is a per-lane convolution — a batched
(1 x D) @ (D x 2D) matmul whose right operand is a DIFFERENT Toeplitz
matrix per lane.  Building that operand costs as many VPU moves as the
multiply itself, and batch-of-tiny matmuls cannot tile the 128x128
systolic array.

This probe measures all three formulations on the real chip:
  1. pairwise VPU mont_mul (the production kernel)     — the baseline
  2. per-lane Toeplitz build + batched dot_general     — the only MXU-ish
     pairwise formulation; expected to LOSE to 1
  3. shared-operand Toeplitz matmul (one constant times the whole batch)
     — the legitimate MXU case, for contrast; fast but inapplicable to
     point adds.

Decision rule from the verdict: if (2) >= 4x (1), rebuild point_add on it;
otherwise record the numbers and close the question permanently.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sha2cq_tpu.fields import device as D, host as H


def timed(fn, *args, iters=3, label="", elems=0):
    f = jax.jit(fn)
    out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:58s} {dt*1e3:9.2f} ms/iter   {elems/dt/1e6:9.1f} Mmul/s")
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n = 1 << 18
    STEPS = 32

    vals_a = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    vals_b = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    a16 = D.pack(vals_a, D.FR)
    b16 = D.pack(vals_b, D.FR)

    # --- 1. production pairwise mont_mul (VPU) ---------------------------
    def chain_mont(a, b):
        r = a
        for _ in range(STEPS):
            r = D.mont_mul(r, b, D.FR)
        return r

    t1 = timed(chain_mont, a16, b16, label=f"1. pairwise VPU mont_mul x{STEPS} (2^18)",
               elems=STEPS * n)

    # --- 2. per-lane Toeplitz + batched dot_general ----------------------
    # 8-bit digits: D=32 planes; c[i,k] = sum_d a[i,d]*b[i,k-d].
    # The Toeplitz operand is rebuilt per lane per multiply (as a real
    # point-add chain would have to — b varies every step).
    def digits8(x16):
        # (16, n) u32 16-bit limbs -> (n, 32) int8-ish digit planes (as i32)
        lo = (x16 & 0xFF).astype(jnp.int32)
        hi = (x16 >> 8).astype(jnp.int32)
        return jnp.stack([lo, hi], axis=1).reshape(32, -1).T  # (n, 32)

    def toeplitz_mul_once(ad, bd):
        # T[i, d, k] = bd[i, k - d] for 0 <= k - d < 32
        cols = []
        zero = jnp.zeros_like(bd)
        for d in range(32):
            # row d of the per-lane Toeplitz: bd shifted right by d digits
            cols.append(jnp.concatenate(
                [zero[:, :d], bd, zero[:, : 31 - d]], axis=1))
        T = jnp.stack(cols, axis=1)  # (n, 32, 63) int32
        return jax.lax.dot_general(
            ad[:, None, :], T, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)[:, 0]  # (n, 63) digit columns

    def chain_toeplitz(a, b):
        ad, bd = digits8(a), digits8(b)
        r = ad
        for _ in range(STEPS):
            c = toeplitz_mul_once(r, bd)
            # fold the 63 columns back to 32 digits (mod 2^8 carries elided:
            # we only measure the multiply substrate, generously)
            r = (c[:, :32] + jnp.concatenate(
                [c[:, 32:], jnp.zeros_like(c[:, :1])], axis=1)) & 0xFF
        return r

    t2 = timed(chain_toeplitz, a16, b16,
               label=f"2. per-lane Toeplitz batched matmul x{STEPS} (2^18)",
               elems=STEPS * n)

    # --- 3. shared-operand Toeplitz matmul (the NTT case) ----------------
    const_T = jnp.asarray(
        rng.integers(0, 127, size=(32, 63), dtype=np.int8), jnp.int8)

    def chain_shared(a):
        r = digits8(a).astype(jnp.int8)
        acc = jnp.zeros((r.shape[0], 63), jnp.int32)
        for _ in range(STEPS):
            acc = acc + jax.lax.dot_general(
                r, const_T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            r = (acc[:, :32] & 0x7F).astype(jnp.int8)
        return acc

    t3 = timed(chain_shared, a16,
               label=f"3. shared-operand int8 MXU matmul x{STEPS} (2^18)",
               elems=STEPS * n)

    print()
    rate1, rate2 = STEPS * n / t1 / 1e6, STEPS * n / t2 / 1e6
    print(f"pairwise VPU: {rate1:.1f} Mmul/s | pairwise 'MXU' (Toeplitz): "
          f"{rate2:.1f} Mmul/s ({rate2 / rate1:.2f}x) | shared-operand MXU: "
          f"{STEPS * n / t3 / 1e6:.1f} Mmul/s (inapplicable to point adds)")
    if rate2 >= 4 * rate1:
        print("VERDICT RULE: >=4x — rebuild point_add on the MXU path")
    else:
        print("VERDICT RULE: <4x — pairwise modmul is not matmul-shaped; "
              "question closed (see BASELINE.md)")


if __name__ == "__main__":
    main()

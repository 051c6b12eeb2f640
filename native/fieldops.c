/* Native BN254 G1 group kernels for the host runtime.
 *
 * The reference's math core is Rust with inline x86-64 asm
 * (arithmetic/curves/src/{derive/field.rs, bn256/assembly.rs}); this is the
 * framework's native counterpart for the host-side work that doesn't belong
 * on the TPU: SRS generation, Feist-Khovratovich table preprocessing chains,
 * small commitment MSMs, and verifier-side folds.  4x64-bit Montgomery
 * arithmetic over Fq with __int128 products; Jacobian point ops; Pippenger
 * MSM.  Exposed through a tiny C ABI consumed via ctypes
 * (sha2cq_tpu/native_loader.py).
 *
 * Data layout at the ABI: field elements are canonical (non-Montgomery)
 * little-endian u64[4]; points are u64[12] (X, Y, Z Jacobian, Z=0 identity);
 * scalars are canonical u64[4].
 */
#include <stdint.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

static const u64 Q[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                         0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 R2[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                          0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
static const u64 RMODQ[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                             0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};
static const u64 NINV = 0x87d20782e4866389ULL;

typedef struct { u64 v[4]; } fq;

static inline int fq_is_zero(const fq *a) {
    return (a->v[0] | a->v[1] | a->v[2] | a->v[3]) == 0;
}

static inline int geq(const u64 a[4], const u64 b[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return 0;
    }
    return 1;
}

static inline void sub_q(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - Q[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static void fq_add(fq *r, const fq *a, const fq *b) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a->v[i] + b->v[i] + carry;
        r->v[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq(r->v, Q)) sub_q(r->v);
}

static void fq_sub(fq *r, const fq *a, const fq *b) {
    u128 borrow = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a->v[i] - b->v[i] - borrow;
        t[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)t[i] + Q[i] + carry;
            t[i] = (u64)s;
            carry = s >> 64;
        }
    }
    memcpy(r->v, t, sizeof t);
}

/* CIOS Montgomery multiplication */
static void fq_mul(fq *r, const fq *a, const fq *b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a->v[i] * b->v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * NINV;
        carry = ((u128)t[0] + (u128)m * Q[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 c2 = (u128)t[j] + (u128)m * Q[j] + carry;
            t[j - 1] = (u64)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    if (t[4] || geq(t, Q)) sub_q(t);
    memcpy(r->v, t, 4 * sizeof(u64));
}

static void fq_to_mont(fq *r, const fq *a) {
    fq r2;
    memcpy(r2.v, R2, sizeof R2);
    fq_mul(r, a, &r2);
}

static void fq_from_mont(fq *r, const fq *a) {
    fq one = {{1, 0, 0, 0}};
    fq_mul(r, a, &one);
}

static void fq_dbl(fq *r, const fq *a) { fq_add(r, a, a); }

/* Fermat inversion a^(q-2) (Montgomery form in/out).  Used once per
 * batched-inversion round in the affine MSM — amortized to ~0 per add. */
static void fq_inv(fq *r, const fq *a) {
    static const u64 QM2[4] = {0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL,
                               0xb85045b68181585dULL, 0x30644e72e131a029ULL};
    fq acc, base = *a;
    memset(&acc, 0, sizeof acc);
    memcpy(acc.v, RMODQ, sizeof RMODQ);
    for (int limb = 0; limb < 4; limb++)
        for (int bit = 0; bit < 64; bit++) {
            if ((QM2[limb] >> bit) & 1) fq_mul(&acc, &acc, &base);
            fq_mul(&base, &base, &base);
        }
    *r = acc;
}

/* Jacobian point, Montgomery-form coordinates */
typedef struct { fq x, y, z; } pt;

static void pt_set_identity(pt *p) {
    memset(p, 0, sizeof *p);
    memcpy(p->x.v, RMODQ, sizeof RMODQ); /* (1, 1, 0) in Montgomery form */
    memcpy(p->y.v, RMODQ, sizeof RMODQ);
}

static int pt_is_identity(const pt *p) { return fq_is_zero(&p->z); }

static void pt_double(pt *r, const pt *p) {
    if (pt_is_identity(p)) { *r = *p; return; }
    fq A, B, C, D, E, F, t, t2;
    fq_mul(&A, &p->x, &p->x);
    fq_mul(&B, &p->y, &p->y);
    fq_mul(&C, &B, &B);
    fq_add(&t, &p->x, &B);
    fq_mul(&t, &t, &t);
    fq_sub(&t, &t, &A);
    fq_sub(&t, &t, &C);
    fq_dbl(&D, &t);
    fq_dbl(&E, &A);
    fq_add(&E, &E, &A);
    fq_mul(&F, &E, &E);
    pt out;
    fq_dbl(&t, &D);
    fq_sub(&out.x, &F, &t);
    fq_sub(&t, &D, &out.x);
    fq_mul(&t, &E, &t);
    fq_dbl(&t2, &C); fq_dbl(&t2, &t2); fq_dbl(&t2, &t2); /* 8C */
    fq_sub(&out.y, &t, &t2);
    fq_mul(&t, &p->y, &p->z);
    fq_dbl(&out.z, &t);
    *r = out;
}

static void pt_add(pt *r, const pt *p, const pt *q) {
    if (pt_is_identity(p)) { *r = *q; return; }
    if (pt_is_identity(q)) { *r = *p; return; }
    fq z1z1, z2z2, u1, u2, s1, s2, t;
    fq_mul(&z1z1, &p->z, &p->z);
    fq_mul(&z2z2, &q->z, &q->z);
    fq_mul(&u1, &p->x, &z2z2);
    fq_mul(&u2, &q->x, &z1z1);
    fq_mul(&t, &q->z, &z2z2);
    fq_mul(&s1, &p->y, &t);
    fq_mul(&t, &p->z, &z1z1);
    fq_mul(&s2, &q->y, &t);
    fq h, rr;
    fq_sub(&h, &u2, &u1);
    fq_sub(&rr, &s2, &s1);
    if (fq_is_zero(&h)) {
        if (fq_is_zero(&rr)) { pt_double(r, p); return; }
        pt_set_identity(r);
        return;
    }
    fq hh, hhh, v;
    fq_mul(&hh, &h, &h);
    fq_mul(&hhh, &h, &hh);
    fq_mul(&v, &u1, &hh);
    pt out;
    fq_mul(&t, &rr, &rr);
    fq_sub(&t, &t, &hhh);
    fq tv;
    fq_dbl(&tv, &v);
    fq_sub(&out.x, &t, &tv);
    fq_sub(&t, &v, &out.x);
    fq_mul(&t, &rr, &t);
    fq tu;
    fq_mul(&tu, &s1, &hhh);
    fq_sub(&out.y, &t, &tu);
    fq_mul(&t, &p->z, &q->z);
    fq_mul(&out.z, &t, &h);
    *r = out;
}

/* mixed add: q affine in Montgomery form (implicit z = 1), madd-2007-bl
 * 7M+4S vs the 12M+4S generic Jacobian add — bucket accumulation feeds
 * every point in with z = 1, so this is the Pippenger hot path. */
static void pt_add_mixed(pt *r, const pt *p, const fq *qx, const fq *qy) {
    if (pt_is_identity(p)) {
        r->x = *qx;
        r->y = *qy;
        memset(&r->z, 0, sizeof(fq));
        memcpy(r->z.v, RMODQ, sizeof RMODQ);
        return;
    }
    fq z1z1, u2, s2, t;
    fq_mul(&z1z1, &p->z, &p->z);
    fq_mul(&u2, qx, &z1z1);
    fq_mul(&t, &p->z, &z1z1);
    fq_mul(&s2, qy, &t);
    fq h, rr;
    fq_sub(&h, &u2, &p->x);
    fq_sub(&rr, &s2, &p->y);
    fq_dbl(&rr, &rr); /* r = 2*(S2 - Y1) */
    if (fq_is_zero(&h)) {
        if (fq_is_zero(&rr)) { pt_double(r, p); return; }
        pt_set_identity(r);
        return;
    }
    fq hh, ii, j, v;
    fq_mul(&hh, &h, &h);
    fq_dbl(&ii, &hh);
    fq_dbl(&ii, &ii); /* I = 4*HH */
    fq_mul(&j, &h, &ii);
    fq_mul(&v, &p->x, &ii);
    pt out;
    fq_mul(&t, &rr, &rr);
    fq_sub(&t, &t, &j);
    fq tv;
    fq_dbl(&tv, &v);
    fq_sub(&out.x, &t, &tv);
    fq_sub(&t, &v, &out.x);
    fq_mul(&t, &rr, &t);
    fq t2;
    fq_mul(&t2, &p->y, &j);
    fq_dbl(&t2, &t2);
    fq_sub(&out.y, &t, &t2);
    fq_add(&t, &p->z, &h);
    fq_mul(&t, &t, &t);
    fq_sub(&t, &t, &z1z1);
    fq_sub(&out.z, &t, &hh);
    *r = out;
}

/* ---------------- exported ABI (canonical u64[4] coordinates) ------------- */

static void load_pt(pt *p, const u64 *in) {
    fq x = {{in[0], in[1], in[2], in[3]}};
    fq y = {{in[4], in[5], in[6], in[7]}};
    fq z = {{in[8], in[9], in[10], in[11]}};
    fq_to_mont(&p->x, &x);
    fq_to_mont(&p->y, &y);
    fq_to_mont(&p->z, &z);
}

static void store_pt(u64 *out, const pt *p) {
    fq x, y, z;
    fq_from_mont(&x, &p->x);
    fq_from_mont(&y, &p->y);
    fq_from_mont(&z, &p->z);
    memcpy(out, x.v, 32);
    memcpy(out + 4, y.v, 32);
    memcpy(out + 8, z.v, 32);
}

void g1_add_jac(const u64 *a, const u64 *b, u64 *out) {
    pt p, q, r;
    load_pt(&p, a);
    load_pt(&q, b);
    pt_add(&r, &p, &q);
    store_pt(out, &r);
}

void g1_scalar_mul(const u64 *point, const u64 *scalar, u64 *out) {
    pt base, acc;
    load_pt(&base, point);
    pt_set_identity(&acc);
    int top = 3;
    while (top >= 0 && scalar[top] == 0) top--;
    if (top >= 0) {
        for (int i = top; i >= 0; i--) {
            u64 w = scalar[i];
            int start = (i == top) ? 63 - __builtin_clzll(w) : 63;
            for (int bit = start; bit >= 0; bit--) {
                pt_double(&acc, &acc);
                if ((w >> bit) & 1) pt_add(&acc, &acc, &base);
            }
        }
    }
    store_pt(out, &acc);
}

/* Pippenger MSM, window c = 8.  points: n * u64[12] (Jacobian canonical),
 * scalars: n * u64[4] canonical.  out: u64[12].  Window sums run in
 * parallel (OpenMP when available), then fold with a doubling chain. */
/* generic Pippenger window pass (unsigned digits, full Jacobian adds) —
 * fallback for inputs with projective (z != 1) points */
static void msm_window_generic(const pt *pts, const u64 *scalars, long n,
                               int w, pt *acc_out) {
    enum { C = 8, NBUCKET = 1 << C };
    pt *buckets = (pt *)__builtin_malloc(sizeof(pt) * NBUCKET);
    for (int b = 0; b < NBUCKET; b++) pt_set_identity(&buckets[b]);
    for (long i = 0; i < n; i++) {
        int limb = (w * C) / 64;
        int shift = (w * C) % 64;
        u64 d = (scalars[4 * i + limb] >> shift);
        if (shift > 64 - C && limb < 3)
            d |= scalars[4 * i + limb + 1] << (64 - shift);
        d &= (NBUCKET - 1);
        if (d) pt_add(&buckets[d], &buckets[d], &pts[i]);
    }
    pt run, acc;
    pt_set_identity(&run);
    pt_set_identity(&acc);
    for (int b = NBUCKET - 1; b >= 1; b--) {
        pt_add(&run, &run, &buckets[b]);
        pt_add(&acc, &acc, &run);
    }
    *acc_out = acc;
    __builtin_free(buckets);
}

/* Batch-affine bucket accumulation for one window: all points landing in
 * each bucket are tree-reduced with AFFINE additions whose divisions share
 * one batched inversion per round (Montgomery trick), ~5M+1S per add vs
 * ~7M+4S for the Jacobian mixed add.  (The reference carries the same idea
 * as an unused `batch_add!` macro, derive/curve.rs:2-143; here it is the
 * production path.)  px/py are scratch of size >= n; pairbuf of >= n/2+1. */
static void msm_window_affine(const pt *pts, const fq *nys, const short *digs,
                              long n, int nw, int w, int hb,
                              fq *px, fq *py, fq *pairbuf, pt *acc_out) {
    long *cnt = (long *)__builtin_malloc(sizeof(long) * (size_t)(hb + 1) * 2);
    long *off = cnt + hb + 1;
    memset(cnt, 0, sizeof(long) * (size_t)(hb + 1));
    for (long i = 0; i < n; i++) {
        int v = digs[i * nw + w];
        if (v) cnt[v > 0 ? v : -v]++;
    }
    long tot = 0;
    for (int b = 1; b <= hb; b++) { off[b] = tot; tot += cnt[b]; }
    long *fill = (long *)__builtin_malloc(sizeof(long) * (size_t)(hb + 1));
    memcpy(fill, off, sizeof(long) * (size_t)(hb + 1));
    for (long i = 0; i < n; i++) {
        int v = digs[i * nw + w];
        if (!v) continue;
        int b = v > 0 ? v : -v;
        long at = fill[b]++;
        px[at] = pts[i].x;
        py[at] = v > 0 ? pts[i].y : nys[i];
    }
    __builtin_free(fill);

    /* tree rounds: halve every bucket's list with one shared inversion */
    fq *dinv = pairbuf;
    long maxc = 0;
    for (int b = 1; b <= hb; b++) if (cnt[b] > maxc) maxc = cnt[b];
    while (maxc > 1) {
        /* collect denominators (dead pairs contribute a 1 so indices align) */
        long m = 0;
        for (int b = 1; b <= hb; b++) {
            long base = off[b];
            for (long k = 0; 2 * k + 1 < cnt[b]; k++) {
                const fq *xa = &px[base + 2 * k], *xb = &px[base + 2 * k + 1];
                fq d;
                fq_sub(&d, xb, xa);
                if (fq_is_zero(&d)) {
                    if (memcmp(py[base + 2 * k].v, py[base + 2 * k + 1].v,
                               sizeof(fq)) == 0)
                        fq_dbl(&d, &py[base + 2 * k]);     /* doubling: 2y */
                    else
                        memcpy(d.v, RMODQ, sizeof RMODQ);  /* cancel: dead */
                }
                dinv[m++] = d;
            }
        }
        /* batched inversion in place */
        if (m) {
            fq accp, run;
            memcpy(accp.v, RMODQ, sizeof RMODQ);
            fq *pref = pairbuf + m;    /* prefix products after dinv slots */
            for (long j = 0; j < m; j++) {
                pref[j] = accp;
                fq_mul(&accp, &accp, &dinv[j]);
            }
            fq_inv(&run, &accp);
            for (long j = m - 1; j >= 0; j--) {
                fq d = dinv[j];
                fq_mul(&dinv[j], &run, &pref[j]);
                fq_mul(&run, &run, &d);
            }
        }
        /* complete the additions, compacting each bucket in place */
        long mi = 0;
        for (int b = 1; b <= hb; b++) {
            long base = off[b], wr = 0;
            long pairs = cnt[b] / 2;
            for (long k = 0; k < pairs; k++) {
                fq xa = px[base + 2 * k], ya = py[base + 2 * k];
                fq xb = px[base + 2 * k + 1], yb = py[base + 2 * k + 1];
                fq d = dinv[mi++];
                fq dx, lam, num;
                fq_sub(&dx, &xb, &xa);
                if (fq_is_zero(&dx)) {
                    if (memcmp(ya.v, yb.v, sizeof(fq)) != 0)
                        continue;                   /* P + (-P): drop */
                    fq xx;                          /* doubling: 3x^2 / 2y */
                    fq_mul(&xx, &xa, &xa);
                    fq_dbl(&num, &xx);
                    fq_add(&num, &num, &xx);
                } else {
                    fq_sub(&num, &yb, &ya);
                }
                fq_mul(&lam, &num, &d);
                fq x3, y3, t;
                fq_mul(&x3, &lam, &lam);
                fq_sub(&x3, &x3, &xa);
                fq_sub(&x3, &x3, &xb);
                fq_sub(&t, &xa, &x3);
                fq_mul(&y3, &lam, &t);
                fq_sub(&y3, &y3, &ya);
                px[base + wr] = x3;
                py[base + wr] = y3;
                wr++;
            }
            if (cnt[b] & 1) {
                px[base + wr] = px[base + cnt[b] - 1];
                py[base + wr] = py[base + cnt[b] - 1];
                wr++;
            }
            cnt[b] = wr;
        }
        maxc = 0;
        for (int b = 1; b <= hb; b++) if (cnt[b] > maxc) maxc = cnt[b];
    }

    /* bucket fold: sum_b b * bucket[b] via running sums */
    pt run, acc;
    pt_set_identity(&run);
    pt_set_identity(&acc);
    for (int b = hb; b >= 1; b--) {
        if (cnt[b])
            pt_add_mixed(&run, &run, &px[off[b]], &py[off[b]]);
        pt_add(&acc, &acc, &run);
    }
    *acc_out = acc;
    __builtin_free(cnt);
}

static void g1_msm_core(pt *pts, const u64 *scalars, long n, u64 *out) {
    /* the commitment bases are affine (z == 1): batch-affine tree path
     * with signed c-bit digits (half the buckets) */
    int affine = 1;
    for (long i = 0; i < n && affine; i++)
        affine = memcmp(pts[i].z.v, RMODQ, sizeof RMODQ) == 0;

    /* window size: larger MSMs amortize the 2^(c-1)-bucket fold; the
     * generic (projective-input) fallback is fixed at c = 8 */
    int c = 8;
    if (affine) {
        int lg = 0;
        while ((1L << lg) < n) lg++;
        c = lg - 5;
        if (c < 8) c = 8;
        if (c > 14) c = 14;
    }
    const int hb = 1 << (c - 1);
    const int nw = (256 + c - 1) / c;
    pt wsum[32];

    if (affine) {
        short *digs = (short *)__builtin_malloc(sizeof(short) * (size_t)n * nw);
        fq *nys = (fq *)__builtin_malloc(sizeof(fq) * (size_t)n);
        fq zero;
        memset(&zero, 0, sizeof zero);
        #ifdef _OPENMP
        #pragma omp parallel for schedule(static)
        #endif
        for (long i = 0; i < n; i++) {
            int carry = 0;
            for (int w = 0; w < nw; w++) {
                int limb = (w * c) / 64;
                int shift = (w * c) % 64;
                u64 d = (scalars[4 * i + limb] >> shift);
                if (shift > 64 - c && limb < 3)
                    d |= scalars[4 * i + limb + 1] << (64 - shift);
                int v = (int)(d & ((u64)(1 << c) - 1)) + carry;
                if (v > hb) { v -= (1 << c); carry = 1; } else carry = 0;
                digs[i * nw + w] = (short)v;
            }
            /* carry out of the top window is impossible: scalars < 2^254 */
            fq_sub(&nys[i], &zero, &pts[i].y);
        }
        #ifdef _OPENMP
        #pragma omp parallel for schedule(dynamic, 1)
        #endif
        for (int w = 0; w < nw; w++) {
            fq *px = (fq *)__builtin_malloc(sizeof(fq) * (size_t)(3 * n + 2));
            fq *py = px + n;
            fq *pairbuf = py + n;   /* n/2 dinv + n/2 prefix + slack */
            msm_window_affine(pts, nys, digs, n, nw, w, hb,
                              px, py, pairbuf, &wsum[w]);
            __builtin_free(px);
        }
        __builtin_free(digs);
        __builtin_free(nys);
    } else {
        #ifdef _OPENMP
        #pragma omp parallel for schedule(dynamic, 1)
        #endif
        for (int w = 0; w < nw; w++)
            msm_window_generic(pts, scalars, n, w, &wsum[w]);
    }

    pt total;
    pt_set_identity(&total);
    for (int w = nw - 1; w >= 0; w--) {
        if (!pt_is_identity(&total))
            for (int d = 0; d < c; d++) pt_double(&total, &total);
        pt_add(&total, &total, &wsum[w]);
    }
    store_pt(out, &total);
}

void g1_msm(const u64 *points, const u64 *scalars, long n, u64 *out) {
    pt *pts = (pt *)__builtin_malloc(sizeof(pt) * (size_t)n);
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (long i = 0; i < n; i++) load_pt(&pts[i], points + 12 * i);
    g1_msm_core(pts, scalars, n, out);
    __builtin_free(pts);
}

/* MSM over a subset of a fixed basis: out = sum_i scalars[i] *
 * basis[indices[i]] — the CQ prover's sparse a/qa/a0 commitments gather a
 * few thousand rows of a preprocessed table basis per lookup argument
 * (static_lookup/prover.rs:220-257); indexing native-side skips the
 * per-call Python gather + marshalling of ~100-byte points. */
void g1_msm_indexed(const u64 *points, const long *indices,
                    const u64 *scalars, long n, u64 *out) {
    pt *pts = (pt *)__builtin_malloc(sizeof(pt) * (size_t)n);
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (long i = 0; i < n; i++) load_pt(&pts[i], points + 12 * indices[i]);
    g1_msm_core(pts, scalars, n, out);
    __builtin_free(pts);
}

/* 4-bit fixed-window scalar mul on Montgomery-form points (internal). */
static void pt_scalar_mul_w4(pt *out, const pt *base, const u64 *scalar) {
    pt table[16];
    pt_set_identity(&table[0]);
    table[1] = *base;
    for (int i = 2; i < 16; i++) pt_add(&table[i], &table[i - 1], base);
    pt acc;
    pt_set_identity(&acc);
    int top = 3;
    while (top >= 0 && scalar[top] == 0) top--;
    if (top < 0) { *out = acc; return; }
    int started = 0;
    for (int i = top; i >= 0; i--) {
        for (int nib = 15; nib >= 0; nib--) {
            unsigned d = (unsigned)((scalar[i] >> (4 * nib)) & 0xF);
            if (started) {
                pt_double(&acc, &acc);
                pt_double(&acc, &acc);
                pt_double(&acc, &acc);
                pt_double(&acc, &acc);
            }
            if (d) { pt_add(&acc, &acc, &table[d]); started = 1; }
            else if (!started) continue;
        }
    }
    *out = acc;
}

/* batch scalar-mul: out[i] = scalar[i] * point[i] (for SRS power chains,
 * FK pointwise products, Lagrange basis construction); OpenMP-parallel
 * with windowed muls. */
void g1_batch_scalar_mul(const u64 *points, const u64 *scalars, long n, u64 *out) {
    #ifdef _OPENMP
    #pragma omp parallel for schedule(dynamic, 16)
    #endif
    for (long i = 0; i < n; i++) {
        pt p, r;
        load_pt(&p, points + 12 * i);
        pt_scalar_mul_w4(&r, &p, scalars + 4 * i);
        store_pt(out + 12 * i, &r);
    }
}

/* ------------------------------- G2 (Fq2) ---------------------------------
 * Fq2 = Fq[u]/(u^2+1); G2 Jacobian points over Fq2.  Needed natively because
 * the CQ TableSRS carries an N-long G2 power list and each table's
 * [T(x)]_2 commitment is a size-N G2 MSM (poly/kzg/commitment.rs:42-47,
 * static_lookup.rs:128-157) — Python G2 muls are ~10 ms each, minutes per
 * 2^16 table. */
typedef struct { fq c0, c1; } fq2;

static void fq2_add(fq2 *r, const fq2 *a, const fq2 *b) {
    fq_add(&r->c0, &a->c0, &b->c0);
    fq_add(&r->c1, &a->c1, &b->c1);
}

static void fq2_sub(fq2 *r, const fq2 *a, const fq2 *b) {
    fq_sub(&r->c0, &a->c0, &b->c0);
    fq_sub(&r->c1, &a->c1, &b->c1);
}

static void fq2_dbl(fq2 *r, const fq2 *a) { fq2_add(r, a, a); }

static void fq2_mul(fq2 *r, const fq2 *a, const fq2 *b) {
    /* Karatsuba: (a0+a1 u)(b0+b1 u) = a0b0 - a1b1 + ((a0+a1)(b0+b1)-a0b0-a1b1) u */
    fq t0, t1, t2, t3;
    fq_mul(&t0, &a->c0, &b->c0);
    fq_mul(&t1, &a->c1, &b->c1);
    fq_add(&t2, &a->c0, &a->c1);
    fq_add(&t3, &b->c0, &b->c1);
    fq_mul(&t2, &t2, &t3);
    fq2 out;
    fq_sub(&out.c0, &t0, &t1);
    fq_sub(&t2, &t2, &t0);
    fq_sub(&out.c1, &t2, &t1);
    *r = out;
}

static int fq2_is_zero(const fq2 *a) {
    return fq_is_zero(&a->c0) && fq_is_zero(&a->c1);
}

typedef struct { fq2 x, y, z; } pt2;

static void pt2_set_identity(pt2 *p) {
    memset(p, 0, sizeof *p);
    memcpy(p->x.c0.v, RMODQ, sizeof RMODQ);
    memcpy(p->y.c0.v, RMODQ, sizeof RMODQ);
}

static int pt2_is_identity(const pt2 *p) { return fq2_is_zero(&p->z); }

static void pt2_double(pt2 *r, const pt2 *p) {
    if (pt2_is_identity(p)) { *r = *p; return; }
    fq2 A, B, C, D, E, F, t, t2;
    fq2_mul(&A, &p->x, &p->x);
    fq2_mul(&B, &p->y, &p->y);
    fq2_mul(&C, &B, &B);
    fq2_add(&t, &p->x, &B);
    fq2_mul(&t, &t, &t);
    fq2_sub(&t, &t, &A);
    fq2_sub(&t, &t, &C);
    fq2_dbl(&D, &t);
    fq2_dbl(&E, &A);
    fq2_add(&E, &E, &A);
    fq2_mul(&F, &E, &E);
    pt2 out;
    fq2_dbl(&t, &D);
    fq2_sub(&out.x, &F, &t);
    fq2_sub(&t, &D, &out.x);
    fq2_mul(&t, &E, &t);
    fq2_dbl(&t2, &C); fq2_dbl(&t2, &t2); fq2_dbl(&t2, &t2);
    fq2_sub(&out.y, &t, &t2);
    fq2_mul(&t, &p->y, &p->z);
    fq2_dbl(&out.z, &t);
    *r = out;
}

static void pt2_add(pt2 *r, const pt2 *p, const pt2 *q) {
    if (pt2_is_identity(p)) { *r = *q; return; }
    if (pt2_is_identity(q)) { *r = *p; return; }
    fq2 z1z1, z2z2, u1, u2, s1, s2, t;
    fq2_mul(&z1z1, &p->z, &p->z);
    fq2_mul(&z2z2, &q->z, &q->z);
    fq2_mul(&u1, &p->x, &z2z2);
    fq2_mul(&u2, &q->x, &z1z1);
    fq2_mul(&t, &q->z, &z2z2);
    fq2_mul(&s1, &p->y, &t);
    fq2_mul(&t, &p->z, &z1z1);
    fq2_mul(&s2, &q->y, &t);
    fq2 h, rr;
    fq2_sub(&h, &u2, &u1);
    fq2_sub(&rr, &s2, &s1);
    if (fq2_is_zero(&h)) {
        if (fq2_is_zero(&rr)) { pt2_double(r, p); return; }
        pt2_set_identity(r);
        return;
    }
    fq2 hh, hhh, v;
    fq2_mul(&hh, &h, &h);
    fq2_mul(&hhh, &h, &hh);
    fq2_mul(&v, &u1, &hh);
    pt2 out;
    fq2_mul(&t, &rr, &rr);
    fq2_sub(&t, &t, &hhh);
    fq2 tv;
    fq2_dbl(&tv, &v);
    fq2_sub(&out.x, &t, &tv);
    fq2_sub(&t, &v, &out.x);
    fq2_mul(&t, &rr, &t);
    fq2 tu;
    fq2_mul(&tu, &s1, &hhh);
    fq2_sub(&out.y, &t, &tu);
    fq2_mul(&t, &p->z, &q->z);
    fq2_mul(&out.z, &t, &h);
    *r = out;
}

static void pt2_scalar_mul_w4(pt2 *out, const pt2 *base, const u64 *scalar) {
    pt2 table[16];
    pt2_set_identity(&table[0]);
    table[1] = *base;
    for (int i = 2; i < 16; i++) pt2_add(&table[i], &table[i - 1], base);
    pt2 acc;
    pt2_set_identity(&acc);
    int top = 3;
    while (top >= 0 && scalar[top] == 0) top--;
    if (top < 0) { *out = acc; return; }
    int started = 0;
    for (int i = top; i >= 0; i--) {
        for (int nib = 15; nib >= 0; nib--) {
            unsigned d = (unsigned)((scalar[i] >> (4 * nib)) & 0xF);
            if (started) {
                pt2_double(&acc, &acc);
                pt2_double(&acc, &acc);
                pt2_double(&acc, &acc);
                pt2_double(&acc, &acc);
            }
            if (d) { pt2_add(&acc, &acc, &table[d]); started = 1; }
        }
    }
    *out = acc;
}

/* ABI: G2 Jacobian canonical = u64[24]: x.c0, x.c1, y.c0, y.c1, z.c0, z.c1 */
static void load_pt2(pt2 *p, const u64 *in) {
    fq t;
    const u64 *src = in;
    fq *dst[6] = {&p->x.c0, &p->x.c1, &p->y.c0, &p->y.c1, &p->z.c0, &p->z.c1};
    for (int i = 0; i < 6; i++) {
        memcpy(t.v, src + 4 * i, 32);
        fq_to_mont(dst[i], &t);
    }
}

static void store_pt2(u64 *out, const pt2 *p) {
    const fq *src[6] = {&p->x.c0, &p->x.c1, &p->y.c0, &p->y.c1, &p->z.c0, &p->z.c1};
    for (int i = 0; i < 6; i++) {
        fq t;
        fq_from_mont(&t, src[i]);
        memcpy(out + 4 * i, t.v, 32);
    }
}

void g2_batch_scalar_mul(const u64 *points, const u64 *scalars, long n, u64 *out) {
    #ifdef _OPENMP
    #pragma omp parallel for schedule(dynamic, 8)
    #endif
    for (long i = 0; i < n; i++) {
        pt2 p, r;
        load_pt2(&p, points + 24 * i);
        pt2_scalar_mul_w4(&r, &p, scalars + 4 * i);
        store_pt2(out + 24 * i, &r);
    }
}

/* G2 Pippenger MSM (window c = 8), same structure as g1_msm. */
void g2_msm(const u64 *points, const u64 *scalars, long n, u64 *out) {
    enum { C = 8, NBUCKET = 1 << C, NW = (256 + C - 1) / C };
    pt2 wsum[NW];
    pt2 *pts = (pt2 *)__builtin_malloc(sizeof(pt2) * (size_t)n);
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (long i = 0; i < n; i++) load_pt2(&pts[i], points + 24 * i);

    #ifdef _OPENMP
    #pragma omp parallel for schedule(dynamic, 1)
    #endif
    for (int w = 0; w < NW; w++) {
        pt2 *buckets = (pt2 *)__builtin_malloc(sizeof(pt2) * NBUCKET);
        for (int b = 0; b < NBUCKET; b++) pt2_set_identity(&buckets[b]);
        for (long i = 0; i < n; i++) {
            int limb = (w * C) / 64;
            int shift = (w * C) % 64;
            u64 d = (scalars[4 * i + limb] >> shift);
            if (shift > 64 - C && limb < 3)
                d |= scalars[4 * i + limb + 1] << (64 - shift);
            d &= (NBUCKET - 1);
            if (d) pt2_add(&buckets[d], &buckets[d], &pts[i]);
        }
        pt2 run, acc;
        pt2_set_identity(&run);
        pt2_set_identity(&acc);
        for (int b = NBUCKET - 1; b >= 1; b--) {
            pt2_add(&run, &run, &buckets[b]);
            pt2_add(&acc, &acc, &run);
        }
        wsum[w] = acc;
        __builtin_free(buckets);
    }

    pt2 total;
    pt2_set_identity(&total);
    for (int w = NW - 1; w >= 0; w--) {
        if (!pt2_is_identity(&total))
            for (int d = 0; d < C; d++) pt2_double(&total, &total);
        pt2_add(&total, &total, &wsum[w]);
    }
    __builtin_free(pts);
    store_pt2(out, &total);
}

/* ---------------- group NTT (the Feist-Khovratovich workhorse) ------------
 *
 * In-place radix-2 DIT NTT over G1 points: bit-reversal permutation then
 * log2(n) butterfly stages; matches ops/ntt.ntt_host semantics (same
 * ordering as the reference's generic best_fft, which IS instantiated over
 * groups in halo2 — arithmetic.rs:171 `best_fft<G: Group>`).
 *
 * points: n * u64[12] canonical Jacobian, in/out.
 * twiddles: (n/2) * u64[4] canonical Fr scalars [w^0, w^1, ... w^{n/2-1}].
 *
 * Cost model: each butterfly pays one ~254-bit windowed scalar mul
 * (~250 doubles + ~60 adds); OpenMP over the butterflies of each stage.
 * A 2^17 NTT is ~1.1M butterflies => minutes single-core, ~tens of
 * seconds on a few cores — vs hours in Python (round-1 437 s for 2^12).
 */
static void pt_neg_inplace(pt *p) {
    fq zero;
    memset(&zero, 0, sizeof zero);
    fq_sub(&p->y, &zero, &p->y);
}

void g1_group_ntt(u64 *points, const u64 *twiddles, long n, int k) {
    /* load to Montgomery form */
    pt *pts = (pt *)__builtin_malloc(sizeof(pt) * (size_t)n);
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (long i = 0; i < n; i++) load_pt(&pts[i], points + 12 * i);

    /* bit-reversal permutation */
    for (long i = 0; i < n; i++) {
        long r = 0;
        long x = i;
        for (int b = 0; b < k; b++) { r = (r << 1) | (x & 1); x >>= 1; }
        if (r > i) { pt tmp = pts[i]; pts[i] = pts[r]; pts[r] = tmp; }
    }

    for (int s = 0; s < k; s++) {
        long half = 1L << s;
        long stride = 1L << (k - 1 - s);
        long nbf = n >> 1;
        #ifdef _OPENMP
        #pragma omp parallel for schedule(dynamic, 64)
        #endif
        for (long bf = 0; bf < nbf; bf++) {
            long blk = bf >> s;
            long j = bf & (half - 1);
            long top = (blk << (s + 1)) | j;
            long bot = top | half;
            pt t;
            if (j == 0) {
                t = pts[bot];
            } else {
                pt_scalar_mul_w4(&t, &pts[bot], twiddles + 4 * (j * stride));
            }
            pt nt = t;
            pt_neg_inplace(&nt);
            pt e = pts[top];
            pt_add(&pts[top], &e, &t);
            pt_add(&pts[bot], &e, &nt);
        }
    }

    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (long i = 0; i < n; i++) store_pt(points + 12 * i, &pts[i]);
    __builtin_free(pts);
}

/* ------------------------- Fr scalar-field kernels ------------------------
 *
 * Host-side Fr (BN254 scalar field) bulk kernels: the prover's CQ
 * log-derivative iNTTs, multiopen polynomial folds, Horner evaluations and
 * kate division are O(n)/O(n log n) bigint loops that were pure Python.
 * Montgomery 4x64 CIOS identical in shape to the fq_* ops above; constants
 * pinned to reference bn256/fr.rs:28-60.
 *
 * ABI: values are canonical little-endian u64[4].  Internally we exploit
 * the identity mont_mul(a_canonical, b*R) = a*b (canonical), so vector
 * kernels convert only the scalar operand to Montgomery form.
 */
static const u64 FRQ[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                           0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 FR_R2[4] = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                             0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};
static const u64 FR_NINV = 0xc2e1f593efffffffULL;

typedef struct { u64 v[4]; } fr;

static inline int fr_geq(const u64 a[4], const u64 b[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return 0;
    }
    return 1;
}

static inline void sub_fr(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - FRQ[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static void fr_add(fr *r, const fr *a, const fr *b) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a->v[i] + b->v[i] + carry;
        r->v[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fr_geq(r->v, FRQ)) sub_fr(r->v);
}

static void fr_sub(fr *r, const fr *a, const fr *b) {
    u128 borrow = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a->v[i] - b->v[i] - borrow;
        t[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)t[i] + FRQ[i] + carry;
            t[i] = (u64)s;
            carry = s >> 64;
        }
    }
    memcpy(r->v, t, sizeof t);
}

static void fr_mul(fr *r, const fr *a, const fr *b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a->v[i] * b->v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * FR_NINV;
        carry = ((u128)t[0] + (u128)m * FRQ[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 c2 = (u128)t[j] + (u128)m * FRQ[j] + carry;
            t[j - 1] = (u64)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    if (t[4] || fr_geq(t, FRQ)) sub_fr(t);
    memcpy(r->v, t, 4 * sizeof(u64));
}

static void fr_to_mont(fr *r, const fr *a) {
    fr r2;
    memcpy(r2.v, FR_R2, sizeof FR_R2);
    fr_mul(r, a, &r2);
}

/* In-place radix-2 DIT NTT over Fr, same semantics as ops/ntt.ntt_host
 * (bit-reverse then breadth-first butterflies; natural order in and out).
 * twiddles: (n/2) canonical scalars [w^0 .. w^{n/2-1}]. */
void fr_ntt(u64 *vals, const u64 *twiddles, long n, int k) {
    fr *a = (fr *)__builtin_malloc(sizeof(fr) * (size_t)n);
    fr *tw = (fr *)__builtin_malloc(sizeof(fr) * (size_t)(n / 2));
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static) if(n >= 65536)
    #endif
    for (long i = 0; i < n; i++) fr_to_mont(&a[i], (const fr *)(vals + 4 * i));
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static) if(n >= 131072)
    #endif
    for (long i = 0; i < n / 2; i++)
        fr_to_mont(&tw[i], (const fr *)(twiddles + 4 * i));

    for (long i = 0; i < n; i++) {
        long r = 0, x = i;
        for (int b = 0; b < k; b++) { r = (r << 1) | (x & 1); x >>= 1; }
        if (r > i) { fr tmp = a[i]; a[i] = a[r]; a[r] = tmp; }
    }

    for (int s = 0; s < k; s++) {
        long half = 1L << s;
        long stride = 1L << (k - 1 - s);
        long nbf = n >> 1;
        #ifdef _OPENMP
        #pragma omp parallel for schedule(static) if(nbf >= 65536)
        #endif
        for (long bf = 0; bf < nbf; bf++) {
            long blk = bf >> s;
            long j = bf & (half - 1);
            long top = (blk << (s + 1)) | j;
            long bot = top | half;
            fr t;
            if (j == 0) t = a[bot];
            else fr_mul(&t, &a[bot], &tw[j * stride]);
            fr e = a[top];
            fr_add(&a[top], &e, &t);
            fr_sub(&a[bot], &e, &t);
        }
    }

    fr one = {{1, 0, 0, 0}};
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static) if(n >= 65536)
    #endif
    for (long i = 0; i < n; i++)
        fr_mul((fr *)(vals + 4 * i), &a[i], &one);  /* from Montgomery */
    __builtin_free(a);
    __builtin_free(tw);
}

/* acc[i] = acc[i] * v + add[i] (all canonical); add may be NULL or shorter
 * than n (addn entries, rest treated as 0) — the gwc/shplonk poly fold. */
void fr_fold(u64 *acc, const u64 *add, long addn, const u64 *v, long n) {
    fr vm;
    fr_to_mont(&vm, (const fr *)v);
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static) if(n >= 131072)
    #endif
    for (long i = 0; i < n; i++) {
        fr t;
        fr_mul(&t, (const fr *)(acc + 4 * i), &vm);
        if (add && i < addn) fr_add(&t, &t, (const fr *)(add + 4 * i));
        memcpy(acc + 4 * i, &t, sizeof t);
    }
}

/* vals[i] *= c (canonical) */
void fr_vec_scale(u64 *vals, const u64 *c, long n) {
    fr cm;
    fr_to_mont(&cm, (const fr *)c);
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static) if(n >= 131072)
    #endif
    for (long i = 0; i < n; i++) {
        fr t;
        fr_mul(&t, (const fr *)(vals + 4 * i), &cm);
        memcpy(vals + 4 * i, &t, sizeof t);
    }
}

/* Horner evaluation out = poly(x); poly canonical, length n. */
void fr_eval_poly(const u64 *poly, long n, const u64 *x, u64 *out) {
    fr xm, acc;
    fr_to_mont(&xm, (const fr *)x);
    memset(&acc, 0, sizeof acc);
    for (long i = n - 1; i >= 0; i--) {
        fr t;
        fr_mul(&t, &acc, &xm);
        fr_add(&acc, &t, (const fr *)(poly + 4 * i));
    }
    memcpy(out, &acc, sizeof acc);
}

/* kate division: q(X) = (p(X) - p(b)) / (X - b), deg q = n-2.
 * out must hold n-1 elements (reference arithmetic.rs:351-387 semantics:
 * quotient only, caller already knows p(b)). */
void fr_kate_div(const u64 *poly, long n, const u64 *b, u64 *out) {
    fr bm, acc;
    fr_to_mont(&bm, (const fr *)b);
    memset(&acc, 0, sizeof acc);
    for (long i = n - 2; i >= 0; i--) {
        fr t;
        fr_mul(&t, &acc, &bm);
        fr_add(&acc, &t, (const fr *)(poly + 4 * (i + 1)));
        memcpy(out + 4 * i, &acc, sizeof acc);
    }
}

/* Batch modular inverse via Montgomery's trick; vals in/out canonical.
 * Zero entries are left as zero (matching fields/host.batch_inv). */
void fr_batch_inv(u64 *vals, long n) {
    fr *pref = (fr *)__builtin_malloc(sizeof(fr) * (size_t)(n + 1));
    fr *vm = (fr *)__builtin_malloc(sizeof(fr) * (size_t)n);
    fr one_m;
    fr one = {{1, 0, 0, 0}};
    fr_to_mont(&one_m, &one);
    pref[0] = one_m;
    for (long i = 0; i < n; i++) {
        fr_to_mont(&vm[i], (const fr *)(vals + 4 * i));
        int z = !(vm[i].v[0] | vm[i].v[1] | vm[i].v[2] | vm[i].v[3]);
        if (z) pref[i + 1] = pref[i];
        else fr_mul(&pref[i + 1], &pref[i], &vm[i]);
    }
    /* invert pref[n] by exponentiation: inv = x^(r-2) */
    fr base = pref[n], accv = one_m;
    u64 e[4];
    memcpy(e, FRQ, sizeof e);
    /* r - 2 */
    e[0] -= 2;  /* FRQ[0] >= 2, no borrow */
    for (int w = 0; w < 4; w++) {
        for (int bit = 0; bit < 64; bit++) {
            if ((e[w] >> bit) & 1) fr_mul(&accv, &accv, &base);
            fr_mul(&base, &base, &base);
        }
    }
    fr inv = accv;
    for (long i = n - 1; i >= 0; i--) {
        int z = !(vm[i].v[0] | vm[i].v[1] | vm[i].v[2] | vm[i].v[3]);
        if (z) continue;
        fr t;
        fr_mul(&t, &pref[i], &inv);       /* inverse of vals[i], mont */
        fr_mul(&inv, &inv, &vm[i]);
        fr_mul((fr *)(vals + 4 * i), &t, &one);  /* from mont -> canonical */
    }
    __builtin_free(pref);
    __builtin_free(vm);
}

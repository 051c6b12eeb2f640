"""The real SHA-256 circuit on CQ — FIPS-180-4 at word_bits=32.

This is the piece neither the reference nor round 1 had: a circuit proving
the *actual* SHA-256 compression (32-bit words, real modular addition,
Davies-Meyer feed-forward, multi-block chaining), with every bitwise op a
CQ lookup into tables of at most 2^18 rows (see tables32.py for the
half/piece/limb decomposition that avoids the reference's 2^32 LongLimbs
wall, sha/src/tables.rs:63-75).

Layout — each block occupies BLOCK_ROWS = 72 rows:
  rows 0..63   round rows: state-before-round-r in explicit limb columns
               (a,b,c,e,f,g as 6 limbs each + d,h words), sigma byte paths,
               maj/ch limb outputs, message schedule, carry bits
  row  64      final state (written by round 63's @+1 gates); a single
               anchored gate collects the 8 state words and the block's
               8 initial words into the dg_in / dg_iv columns of rows 64..71
  rows 64..71  digest rows: dg_w = dg_iv + dg_in mod 2^wb (the Davies-Meyer
               feed-forward), halved for range checks, copied to the
               instance (last block) or consumed by the next block's chain
               gate (rotations -8..-1 from its first row)

Soundness notes:
  * every CQ lookup uses only rotation-0 queries, so blinding-row
    wraparound can never poison a lookup (the round-1 lesson);
  * sigma-input columns are copy-constrained to the schedule halves 15/2
    rounds back instead of querying them at a rotation;
  * all limb/half range constraints come from table membership (the maj/ch
    tables enumerate exactly the valid limb triples; the sigma/id tables
    have the input half as their row index).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

from ...plonk.circuit_ir import ConstraintSystem, StaticTableId
from . import sha256 as model
from .tables32 import SCHEME32, HalfScheme

BLOCK_ROWS = 72
DIGEST_ROW = 64


def table_ids(s: HalfScheme) -> Dict[str, Dict[str, StaticTableId]]:
    """StaticTableIds for every (family, component)."""
    from .tables32 import all_component_names
    ids: Dict[str, Dict[str, StaticTableId]] = {}
    for fam, comps in all_component_names(s).items():
        ids[fam] = {comp: StaticTableId(f"s256_{s.word_bits}_{fam}_{comp}")
                    for comp in comps}
    return ids


class Sha256Circuit:
    """Proves: the public 8-word instance is the SHA-256 chaining value of
    the witness message blocks (FIPS digest when the blocks carry standard
    padding).  SCHEME selects the word width; SCHEME32 is real SHA-256."""

    SCHEME: HalfScheme = SCHEME32

    def __init__(self, blocks: Sequence[Sequence[int]], static_tables: dict):
        """blocks: list of 16-word message blocks; static_tables:
        family -> {component -> StaticTable}."""
        self.blocks = [list(b) for b in blocks]
        assert all(len(b) == 16 for b in self.blocks)
        self.static_tables = static_tables

    # ------------------------------------------------------------------
    @classmethod
    def configure(cls, meta: ConstraintSystem):
        s = cls.SCHEME
        wb = s.word_bits
        ids = table_ids(s)
        widths = s.limb_widths
        shifts = s.limb_shifts
        NP = s.n_pieces

        adv = meta.advice_column
        cols: Dict[str, object] = {}
        names = []
        for fam in ("al", "bl", "cl", "el", "fl", "gl", "mj", "ch"):
            names += [f"{fam}{i}" for i in range(6)]
        names += ["d", "h", "a_hi", "a_lo", "e_hi", "e_lo", "wd", "w_hi", "w_lo"]
        for pfx in ("s0h", "s0l", "s0x", "s1h", "s1l", "s1x",
                    "g0h", "g0l", "g0x", "g1h", "g1l", "g1x"):
            names += [f"{pfx}{j}" for j in range(NP)]
        names += ["s0in_h", "s0in_l", "s1in_h", "s1in_l",
                  "wc0", "wc1", "ec0", "ec1", "ec2", "ac0", "ac1", "ac2",
                  "dg_in", "dg_iv", "dg_w", "dg_hi", "dg_lo", "dg_c"]
        for n in names:
            cols[n] = adv()
        inst = meta.instance_column()
        q_state = meta.fixed_column()
        q_round = meta.fixed_column()
        q_trans = meta.fixed_column()
        q_sched = meta.fixed_column()
        q_first = meta.fixed_column()
        q_digest = meta.fixed_column()
        q_dgrow = meta.fixed_column()
        q_chain = meta.fixed_column()
        k_col = meta.fixed_column()

        for n in ("s0in_h", "s0in_l", "s1in_h", "s1in_l", "w_hi", "w_lo", "dg_w"):
            meta.enable_equality(cols[n])
        meta.enable_equality(inst)

        # ---- static lookups (rotation-0 only; fire on every usable row)
        def lk(name, pairs):
            meta.lookup_static(name, lambda c, _p=pairs: [
                (c.query_advice(cols[col], 0), tid) for col, tid in _p])

        for fn, hi_in, lo_in, hcols, lcols, xcols in (
                ("bs0", "a_hi", "a_lo", "s0h", "s0l", "s0x"),
                ("bs1", "e_hi", "e_lo", "s1h", "s1l", "s1x"),
                ("ss0", "s0in_h", "s0in_l", "g0h", "g0l", "g0x"),
                ("ss1", "s1in_h", "s1in_l", "g1h", "g1l", "g1x")):
            lk(f"{fn}_hi", [(hi_in, ids[f"{fn}h"]["i"])] +
               [(f"{hcols}{j}", ids[f"{fn}h"][f"b{j}"]) for j in range(NP)])
            lk(f"{fn}_lo", [(lo_in, ids[f"{fn}l"]["i"])] +
               [(f"{lcols}{j}", ids[f"{fn}l"][f"b{j}"]) for j in range(NP)])
            for j in range(NP):
                lk(f"{fn}_xor{j}", [(f"{hcols}{j}", ids["xorp"]["x"]),
                                    (f"{lcols}{j}", ids["xorp"]["y"]),
                                    (f"{xcols}{j}", ids["xorp"]["z"])])

        for i, w in enumerate(widths):
            lk(f"maj{i}", [(f"al{i}", ids[f"maj{w}"]["x"]),
                           (f"bl{i}", ids[f"maj{w}"]["y"]),
                           (f"cl{i}", ids[f"maj{w}"]["z"]),
                           (f"mj{i}", ids[f"maj{w}"]["f"])])
            lk(f"ch{i}", [(f"el{i}", ids[f"ch{w}"]["x"]),
                          (f"fl{i}", ids[f"ch{w}"]["y"]),
                          (f"gl{i}", ids[f"ch{w}"]["z"]),
                          (f"ch{i}", ids[f"ch{w}"]["f"])])

        for col in ("w_hi", "w_lo", "dg_hi", "dg_lo"):
            lk(f"range_{col}", [(col, ids["idh"]["i"])])

        # ---- gate helpers
        def word(c, fam, rot=0):
            e = None
            for i in range(6):
                q = c.query_advice(cols[f"{fam}{i}"], rot) * (1 << shifts[i])
                e = q if e is None else e + q
            return e

        def pieces(c, pfx, rot=0):
            e = None
            for j in range(NP):
                q = c.query_advice(cols[f"{pfx}{j}"], rot) * (1 << (j * s.piece))
                e = q if e is None else e + q
            return e

        def limbsum(c, fam, rot=0):
            e = None
            for i, sh in enumerate(shifts):
                q = c.query_advice(cols[f"{fam}{i}"], rot) * (1 << sh)
                e = q if e is None else e + q
            return e

        H2 = 1 << s.half
        W2 = 1 << wb

        def halves_gates(c):
            q = c.query_fixed(q_state, 0)
            return [
                q * (word(c, "al") - (c.query_advice(cols["a_hi"], 0) * H2
                                      + c.query_advice(cols["a_lo"], 0))),
                q * (word(c, "el") - (c.query_advice(cols["e_hi"], 0) * H2
                                      + c.query_advice(cols["e_lo"], 0))),
            ]

        meta.create_gate("s256_halves", halves_gates)

        def round_gates(c):
            q = c.query_fixed(q_round, 0)
            k = c.query_fixed(k_col, 0)
            S1 = pieces(c, "s1x")
            S0 = pieces(c, "s0x")
            CHw = limbsum(c, "ch")
            MJw = limbsum(c, "mj")
            d = c.query_advice(cols["d"], 0)
            h = c.query_advice(cols["h"], 0)
            wd = c.query_advice(cols["wd"], 0)
            EC = (c.query_advice(cols["ec0"], 0)
                  + c.query_advice(cols["ec1"], 0) * 2
                  + c.query_advice(cols["ec2"], 0) * 4)
            AC = (c.query_advice(cols["ac0"], 0)
                  + c.query_advice(cols["ac1"], 0) * 2
                  + c.query_advice(cols["ac2"], 0) * 4)
            out = [
                q * (d + h + S1 + CHw + k + wd - EC * W2 - word(c, "el", 1)),
                q * (h + S1 + CHw + k + wd + S0 + MJw - AC * W2 - word(c, "al", 1)),
                q * (c.query_advice(cols["wd"], 0)
                     - (c.query_advice(cols["w_hi"], 0) * H2
                        + c.query_advice(cols["w_lo"], 0))),
            ]
            for b in ("ec0", "ec1", "ec2", "ac0", "ac1", "ac2", "wc0", "wc1"):
                v = c.query_advice(cols[b], 0)
                out.append(q * v * (v - 1))
            return out

        meta.create_gate("s256_round", round_gates)

        def trans_gates(c):
            q = c.query_fixed(q_trans, 0)
            out = []
            for nxt, cur in (("bl", "al"), ("cl", "bl"), ("fl", "el"), ("gl", "fl")):
                for i in range(6):
                    out.append(q * (c.query_advice(cols[f"{nxt}{i}"], 1)
                                    - c.query_advice(cols[f"{cur}{i}"], 0)))
            out.append(q * (c.query_advice(cols["d"], 1) - word(c, "cl")))
            out.append(q * (c.query_advice(cols["h"], 1) - word(c, "gl")))
            return out

        meta.create_gate("s256_trans", trans_gates)

        def sched_gates(c):
            q = c.query_fixed(q_sched, 0)
            WC = (c.query_advice(cols["wc0"], 0)
                  + c.query_advice(cols["wc1"], 0) * 2)
            return [q * (pieces(c, "g1x") + c.query_advice(cols["wd"], -7)
                         + pieces(c, "g0x") + c.query_advice(cols["wd"], -16)
                         - c.query_advice(cols["wd"], 0) - WC * W2)]

        meta.create_gate("s256_sched", sched_gates)

        iv = model.h_constants(wb)

        def first_gates(c):
            q = c.query_fixed(q_first, 0)
            state = [word(c, "al"), word(c, "bl"), word(c, "cl"),
                     c.query_advice(cols["d"], 0),
                     word(c, "el"), word(c, "fl"), word(c, "gl"),
                     c.query_advice(cols["h"], 0)]
            return [q * (e - v) for e, v in zip(state, iv)]

        meta.create_gate("s256_first", first_gates)

        def state_words(c, rot):
            return [word(c, "al", rot), word(c, "bl", rot), word(c, "cl", rot),
                    c.query_advice(cols["d"], rot),
                    word(c, "el", rot), word(c, "fl", rot), word(c, "gl", rot),
                    c.query_advice(cols["h"], rot)]

        def digest_collect(c):
            # anchored at row 64 of each block: pull the 8 final-state words
            # (rot 0) and the block's initial words (rot -64) into rows 64..71
            q = c.query_fixed(q_digest, 0)
            out = []
            fin = state_words(c, 0)
            ini = state_words(c, -DIGEST_ROW)
            for j in range(8):
                out.append(q * (c.query_advice(cols["dg_in"], j) - fin[j]))
                out.append(q * (c.query_advice(cols["dg_iv"], j) - ini[j]))
            return out

        meta.create_gate("s256_digest_collect", digest_collect)

        def dgrow_gates(c):
            q = c.query_fixed(q_dgrow, 0)
            dc = c.query_advice(cols["dg_c"], 0)
            return [
                q * (c.query_advice(cols["dg_w"], 0)
                     - (c.query_advice(cols["dg_in"], 0)
                        + c.query_advice(cols["dg_iv"], 0) - dc * W2)),
                q * dc * (dc - 1),
                q * (c.query_advice(cols["dg_w"], 0)
                     - (c.query_advice(cols["dg_hi"], 0) * H2
                        + c.query_advice(cols["dg_lo"], 0))),
            ]

        meta.create_gate("s256_dgrow", dgrow_gates)

        def chain_gates(c):
            # anchored at the first row of block b >= 1: initial state equals
            # the previous block's digest words at rotations -8..-1
            q = c.query_fixed(q_chain, 0)
            state = state_words(c, 0)
            return [q * (state[j] - c.query_advice(cols["dg_w"], -8 + j))
                    for j in range(8)]

        meta.create_gate("s256_chain", chain_gates)

        return {
            "cols": cols, "inst": inst, "k_col": k_col,
            "q_state": q_state, "q_round": q_round, "q_trans": q_trans,
            "q_sched": q_sched, "q_first": q_first, "q_digest": q_digest,
            "q_dgrow": q_dgrow, "q_chain": q_chain,
        }

    # ------------------------------------------------------------------
    def synthesize(self, config, layouter):
        s = type(self).SCHEME
        wb = s.word_bits
        mask = (1 << wb) - 1
        hmask = (1 << s.half) - 1
        pmask = (1 << s.piece) - 1
        widths = s.limb_widths
        shifts = s.limb_shifts
        NP = s.n_pieces
        cols = config["cols"]
        ids = table_ids(s)

        for fam, comps in self.static_tables.items():
            for comp, table in comps.items():
                layouter.register_static_table(ids[fam][comp], table)

        K = model.k_constants(wb)
        iv = model.h_constants(wb)

        def limbs_of(w):
            return [(w >> sh) & ((1 << wd) - 1) for wd, sh in zip(widths, shifts)]

        def sigma_parts(fn, x):
            hi, lo = (x >> s.half) & hmask, x & hmask
            vh = fn((hi << s.half) & mask, wb)
            vl = fn(lo, wb)
            return (hi, lo,
                    [(vh >> (j * s.piece)) & pmask for j in range(NP)],
                    [(vl >> (j * s.piece)) & pmask for j in range(NP)],
                    [((vh ^ vl) >> (j * s.piece)) & pmask for j in range(NP)])

        FIXED_KEYS = ("q_state", "q_round", "q_trans", "q_sched", "q_first",
                      "q_digest", "q_dgrow", "q_chain", "k_col")

        def assign_all(region):
            # Vectorized witness generation: fill plain-int column arrays and
            # hand them to the region as whole slices (one sink call per
            # column instead of ~570k per-cell calls at 64 blocks) — the
            # "assign whole column slices" departure from the reference's
            # per-cell closures (SURVEY §7 stage 6).
            rows = len(self.blocks) * BLOCK_ROWS
            adv_vals = {name: [0] * rows for name in cols}
            fx_vals = {key: [0] * rows for key in FIXED_KEYS}

            def put(name, row, value):
                adv_vals[name][row] = int(value)

            def putf(key, row, value):
                fx_vals[key][row] = int(value)

            state = list(iv)
            nblocks = len(self.blocks)

            for b, block in enumerate(self.blocks):
                base = b * BLOCK_ROWS
                W = model.message_schedule(block, wb)
                init_state = list(state)
                a, bb, cc, d, e, f, g, h = state

                # fixed columns for this block
                for r in range(64):
                    putf("q_round", base + r, 1)
                    putf("q_trans", base + r, 1)
                    putf("k_col", base + r, K[r])
                for r in range(65):
                    putf("q_state", base + r, 1)
                for r in range(16, 64):
                    putf("q_sched", base + r, 1)
                putf("q_digest", base + DIGEST_ROW, 1)
                for r in range(DIGEST_ROW, DIGEST_ROW + 8):
                    putf("q_dgrow", base + r, 1)
                if b == 0:
                    putf("q_first", 0, 1)
                else:
                    putf("q_chain", base, 1)

                def put_state(row, st):
                    a, bb, cc, d, e, f, g, h = st
                    for fam, wv in (("al", a), ("bl", bb), ("cl", cc),
                                    ("el", e), ("fl", f), ("gl", g)):
                        for i, lv in enumerate(limbs_of(wv)):
                            put(f"{fam}{i}", row, lv)
                    put("d", row, d)
                    put("h", row, h)
                    put("a_hi", row, (a >> s.half) & hmask)
                    put("a_lo", row, a & hmask)
                    put("e_hi", row, (e >> s.half) & hmask)
                    put("e_lo", row, e & hmask)
                    # sigma byte paths + maj/ch outputs (checked on every row)
                    _, _, hb, lb, xb = sigma_parts(model.big_sigma0, a)
                    for j in range(NP):
                        put(f"s0h{j}", row, hb[j])
                        put(f"s0l{j}", row, lb[j])
                        put(f"s0x{j}", row, xb[j])
                    _, _, hb, lb, xb = sigma_parts(model.big_sigma1, e)
                    for j in range(NP):
                        put(f"s1h{j}", row, hb[j])
                        put(f"s1l{j}", row, lb[j])
                        put(f"s1x{j}", row, xb[j])
                    la, lb_, lc = limbs_of(a), limbs_of(bb), limbs_of(cc)
                    le, lf, lg = limbs_of(e), limbs_of(f), limbs_of(g)
                    for i, wd_ in enumerate(widths):
                        lm = (1 << wd_) - 1
                        put(f"mj{i}", row, model.maj(la[i], lb_[i], lc[i]) & lm)
                        put(f"ch{i}", row, model.ch(le[i], lf[i], lg[i]) & lm)

                for r in range(64):
                    row = base + r
                    st = (a, bb, cc, d, e, f, g, h)
                    put_state(row, st)

                    wr = W[r]
                    put("wd", row, wr)
                    put("w_hi", row, (wr >> s.half) & hmask)
                    put("w_lo", row, wr & hmask)
                    if r >= 16:  # (r < 16 columns stay zero-initialized)
                        i0, i1 = W[r - 15], W[r - 2]
                        h0, l0, hb, lb, xb = sigma_parts(model.small_sigma0, i0)
                        put("s0in_h", row, h0)
                        put("s0in_l", row, l0)
                        for j in range(NP):
                            put(f"g0h{j}", row, hb[j])
                            put(f"g0l{j}", row, lb[j])
                            put(f"g0x{j}", row, xb[j])
                        h1, l1, hb, lb, xb = sigma_parts(model.small_sigma1, i1)
                        put("s1in_h", row, h1)
                        put("s1in_l", row, l1)
                        for j in range(NP):
                            put(f"g1h{j}", row, hb[j])
                            put(f"g1l{j}", row, lb[j])
                            put(f"g1x{j}", row, xb[j])
                        wsum = (model.small_sigma1(i1, wb) + W[r - 7]
                                + model.small_sigma0(i0, wb) + W[r - 16])
                        wc = wsum >> wb
                        put("wc0", row, wc & 1)
                        put("wc1", row, (wc >> 1) & 1)

                    # round computation
                    s1w = model.big_sigma1(e, wb)
                    s0w = model.big_sigma0(a, wb)
                    chw = model.ch(e, f, g) & mask
                    mjw = model.maj(a, bb, cc) & mask
                    esum = d + h + s1w + chw + K[r] + wr
                    new_e = esum & mask
                    ec = esum >> wb
                    put("ec0", row, ec & 1)
                    put("ec1", row, (ec >> 1) & 1)
                    put("ec2", row, (ec >> 2) & 1)
                    asum = h + s1w + chw + K[r] + wr + s0w + mjw
                    new_a = asum & mask
                    ac = asum >> wb
                    put("ac0", row, ac & 1)
                    put("ac1", row, (ac >> 1) & 1)
                    put("ac2", row, (ac >> 2) & 1)

                    a, bb, cc, d, e, f, g, h = (
                        new_a, a, bb, cc, new_e, e, f, g)

                # row 64: final state (filled by the last round's witnesses);
                # the per-round columns of rows 64..71 stay zero-initialized
                put_state(base + DIGEST_ROW, (a, bb, cc, d, e, f, g, h))

                # digest rows
                fin = [a, bb, cc, d, e, f, g, h]
                new_state = []
                for j in range(8):
                    row = base + DIGEST_ROW + j
                    tot = fin[j] + init_state[j]
                    dg = tot & mask
                    put("dg_in", row, fin[j])
                    put("dg_iv", row, init_state[j])
                    put("dg_w", row, dg)
                    put("dg_hi", row, (dg >> s.half) & hmask)
                    put("dg_lo", row, dg & hmask)
                    put("dg_c", row, tot >> wb)
                    new_state.append(dg)
                # rows 65..71 per-round columns and non-digest-row dg columns
                # stay zero-initialized

                state = new_state

            # hand the filled columns to the region as whole slices
            for name, vals in adv_vals.items():
                region.assign_advice_slice(cols[name], 0, vals)
            for key, vals in fx_vals.items():
                region.assign_fixed_slice(config[key], 0, vals)

            # sigma-input copies (per block, rows >= 16)
            cell = region.cell
            for b in range(nblocks):
                base = b * BLOCK_ROWS
                for r in range(16, 64):
                    region.constrain_equal(
                        cell(cols["s0in_h"], base + r),
                        cell(cols["w_hi"], base + r - 15))
                    region.constrain_equal(
                        cell(cols["s0in_l"], base + r),
                        cell(cols["w_lo"], base + r - 15))
                    region.constrain_equal(
                        cell(cols["s1in_h"], base + r),
                        cell(cols["w_hi"], base + r - 2))
                    region.constrain_equal(
                        cell(cols["s1in_l"], base + r),
                        cell(cols["w_lo"], base + r - 2))
            last = (nblocks - 1) * BLOCK_ROWS + DIGEST_ROW
            return [cell(cols["dg_w"], last + j) for j in range(8)]

        dg_cells = layouter.assign_region("sha256", assign_all)
        for j in range(8):
            layouter.constrain_instance(dg_cells[j], config["inst"], j)

    # ------------------------------------------------------------------
    def expected_digest(self) -> List[int]:
        s = type(self).SCHEME
        state = model.h_constants(s.word_bits)
        for block in self.blocks:
            state = model.sha_compress_final(state, block, s.word_bits)
        return state

    def rows_needed(self) -> int:
        return len(self.blocks) * BLOCK_ROWS

"""Generate (or check) the Rust-crosscheck fixtures.

The fixtures pin everything a toolchain-equipped machine needs to verify
this framework's proofs with the REFERENCE Rust verifier
(/root/reference/halo2_proofs/src/plonk/verifier.rs:34-489 driven as in
tests/my_test.rs:179-259), with no Python in the loop:

  fixtures/mytest/proof.bin   proof bytes for the my_test.rs MyCircuit
                              (the circuit at my_test.rs:43-110 — it exists
                              verbatim in the reference, so the Rust side
                              needs zero new circuit code)
  fixtures/mytest/meta.json   toxic-waste s, k, table values, instances,
                              the expected Fiat-Shamir challenge sequence,
                              vk.transcript_repr, and the Rust pinned-VK
                              string our keygen claims Rust would print
  fixtures/simple/*           same for a gate+permutation+instance circuit
                              (models/simple.py), covering the non-lookup
                              protocol surface

Usage:
  python crosscheck/gen_fixtures.py          # (re)write fixtures
  python crosscheck/gen_fixtures.py --check  # assert committed == generated

The companion Rust harness is crosscheck/rust/*.rs; crosscheck/run.sh wires
it into a copy of the reference tree when a cargo toolchain exists.
"""
import hashlib
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from sha2cq_tpu.poly.kzg.strategy import AccumulatorStrategy
from sha2cq_tpu.utils.transcript import Blake2bRead

P = FR_MOD
HERE = os.path.dirname(os.path.abspath(__file__))


class RecordingRead(Blake2bRead):
    """Blake2bRead that records every squeezed challenge, so the fixture can
    pin the full Fiat-Shamir sequence (theta, beta, gamma, y, x, v, u, ...)
    the Rust verifier must reproduce byte-for-byte."""

    def __init__(self, proof: bytes):
        super().__init__(proof)
        self.challenges = []

    def squeeze_challenge(self) -> int:
        c = super().squeeze_challenge()
        self.challenges.append(c)
        return c


def _emit(name: str, proof: bytes, meta: dict, check: bool) -> None:
    d = os.path.join(HERE, "fixtures", name)
    os.makedirs(d, exist_ok=True)
    meta = dict(meta)
    meta["proof_blake2b16"] = hashlib.blake2b(proof, digest_size=16).hexdigest()
    meta["proof_len"] = len(proof)
    # plain-file copies so the Rust harness needs no JSON parser:
    files = {
        "proof.bin": proof,
        "meta.json": json.dumps(meta, indent=1, sort_keys=True) + "\n",
        "s_dec.txt": str(int(meta["toxic_s"], 16)) + "\n",
        "vk_pinned_rust.txt": meta["vk_pinned_rust"],
        "instances.txt": "\n".join(
            " ".join(str(v) for v in col) for col in meta["instances"]) + "\n",
    }
    for fname, data in files.items():
        path = os.path.join(d, fname)
        mode = "b" if isinstance(data, bytes) else ""
        if check:
            with open(path, "r" + mode) as f:
                assert f.read() == data, f"{name}/{fname} differs"
        else:
            with open(path, "w" + mode) as f:
                f.write(data)
    print(f"{name}: fixtures {'match' if check else 'written'} "
          f"({len(proof)} B proof)")


def gen_mytest(check: bool) -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(HERE), "tests"))
    from test_e2e_cq import TABLE_2_VALUES, TABLE_VALUES, MyCircuit, _setup

    K = 3
    rng, srs, t1, t2, params, configs, b0 = _setup(K)
    # recover s deterministically the same way _setup does
    s = random.Random(0x6371).randrange(P)
    circuit = MyCircuit(t1, t2)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, configs, b0, vk, circuit)
    proof = create_proof(params, pk, [circuit], [[]], rng=random.Random(0x60))

    read = RecordingRead(proof)
    strategy = AccumulatorStrategy(params.verifier_params(), rng=random.Random(1))
    assert verify_proof(params.verifier_params(), vk, strategy, [[]],
                        read).check(), "fixture proof must verify"
    meta = {
        "circuit": "my_test.rs MyCircuit (halo2_proofs/tests/my_test.rs:43-110)",
        "k": K,
        "table_n": 16,
        "toxic_s": hex(s),
        "table_values": TABLE_VALUES,
        "table_2_values": TABLE_2_VALUES,
        "advice": {"col0": [30, 6], "col1": [15, 3]},
        "instances": [],
        "challenges": [hex(c) for c in read.challenges],
        "vk_transcript_repr": hex(vk.transcript_repr),
        "vk_pinned_rust": vk._pinned_str_rust(),
        "notes": "proof blinds drawn from Python random.Random(0x60); the "
                 "verifier needs none of that — only the bytes. Identity "
                 "commitments are encoded as 32 zero bytes (see "
                 "utils/transcript.py common_point note) — if the Rust "
                 "verifier rejects a proof on an identity point read, that "
                 "known byte-compat edge is the first thing to check.",
    }
    _emit("mytest", proof, meta, check)


def gen_simple(check: bool) -> None:
    from sha2cq_tpu.models.simple import SimpleCircuit
    from sha2cq_tpu.poly.kzg.params import ParamsKZG

    K = 4
    s = random.Random(0x73696d).randrange(P)  # "sim"
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    a0, b0v = 7, 11
    circuit = SimpleCircuit(a0, b0v)
    inst = [b0v, a0]
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, {}, [], vk, circuit)
    proof = create_proof(params, pk, [circuit], [[inst]],
                         rng=random.Random(0x61))
    read = RecordingRead(proof)
    strategy = AccumulatorStrategy(params.verifier_params(), rng=random.Random(1))
    assert verify_proof(params.verifier_params(), vk, strategy, [[inst]],
                        read).check(), "fixture proof must verify"
    meta = {
        "circuit": "models/simple.py SimpleCircuit (gate + copy constraint + "
                   "instance; Rust equivalent in crosscheck/rust)",
        "k": K,
        "toxic_s": hex(s),
        "a0": a0,
        "b0": b0v,
        "instances": [inst],
        "challenges": [hex(c) for c in read.challenges],
        "vk_transcript_repr": hex(vk.transcript_repr),
        "vk_pinned_rust": vk._pinned_str_rust(),
    }
    _emit("simple", proof, meta, check)


class PlonkApiCircuit:
    """plonk_api.rs-class coverage in ONE circuit: a fixed-gated mul gate,
    two compressible selectors gating add/sub gates, a dynamic lookup of `a`
    into a fixed table, a copy constraint, and a public instance.  The Rust
    mirror is crosscheck/rust/plonkapi_crosscheck.rs — creation order here
    and there must match exactly (reference plonk_api.rs:535-564 exercises
    the same surface under both GWC and SHPLONK)."""

    TABLE = list(range(12))

    @classmethod
    def configure(cls, meta):
        from sha2cq_tpu.plonk import ConstraintSystem  # noqa: F401
        a = meta.advice_column()
        b = meta.advice_column()
        c = meta.advice_column()
        q_mul = meta.fixed_column()
        table = meta.lookup_table_column()
        inst = meta.instance_column()
        s_add = meta.selector()
        s_sub = meta.selector()
        for col in (a, b, c, inst):
            meta.enable_equality(col)
        meta.create_gate("mul", lambda cells: [
            cells.query_fixed(q_mul, 0)
            * (cells.query_advice(a, 0) * cells.query_advice(b, 0)
               - cells.query_advice(c, 0))])
        meta.create_gate("add", lambda cells: [
            cells.query_selector(s_add)
            * (cells.query_advice(a, 0) + cells.query_advice(b, 0)
               - cells.query_advice(c, 0))])
        meta.create_gate("sub", lambda cells: [
            cells.query_selector(s_sub)
            * (cells.query_advice(a, 0) - cells.query_advice(b, 0)
               - cells.query_advice(c, 0))])
        meta.lookup("range", lambda cells: [
            (cells.query_advice(a, 0), table)])
        return {"a": a, "b": b, "c": c, "q_mul": q_mul, "table": table,
                "inst": inst, "s_add": s_add, "s_sub": s_sub}

    # witness: rows 0-2 mul-gated, row 3 add-gated, row 4 sub-gated;
    # b[1] copies a[0]; c[0] is public
    A_VALS = [3, 7, 5, 8, 9]
    B_VALS = [4, 3, 11, 2, 4]

    def __init__(self, a_vals=None, b_vals=None):
        # per-instance witnesses for the multi-circuit fixture; the copy
        # constraint b[1] == a[0] must hold, so b_vals[1] tracks a_vals[0]
        if a_vals is not None:
            self.A_VALS = a_vals
        if b_vals is not None:
            self.B_VALS = b_vals
        assert self.B_VALS[1] == self.A_VALS[0]

    def synthesize(self, cfg, layouter):
        from sha2cq_tpu.circuit import Value

        def fill_table(table):
            for i, v in enumerate(self.TABLE):
                table.assign_cell(cfg["table"], i, Value.known(v))
        layouter.assign_table("range", fill_table)

        cells = {}

        def assign(region):
            for i, (av, bv) in enumerate(zip(self.A_VALS, self.B_VALS)):
                if i < 3:
                    region.assign_fixed(cfg["q_mul"], i, Value.known(1))
                    cv = av * bv % P
                elif i == 3:
                    region.enable_selector(cfg["s_add"], i)
                    cv = (av + bv) % P
                else:
                    region.enable_selector(cfg["s_sub"], i)
                    cv = (av - bv) % P
                ca = region.assign_advice(cfg["a"], i, Value.known(av))
                cb = region.assign_advice(cfg["b"], i, Value.known(bv))
                cc = region.assign_advice(cfg["c"], i, Value.known(cv))
                cells[i] = (ca, cb, cc)
            region.constrain_equal(cells[0][0].cell, cells[1][1].cell)
            return cells

        got = layouter.assign_region("rows", assign)
        layouter.constrain_instance(got[0][2].cell, cfg["inst"], 0)


def gen_plonkapi(check: bool) -> None:
    """Two fixtures from one circuit/vk: GWC and SHPLONK multiopen proofs
    (reference plonk_api.rs:535-564).  Selectors are COMPRESSED (the
    reference's keygen always compresses, compress_selectors.rs)."""
    K = 5
    s = random.Random(0x706170).randrange(P)  # "pap"
    from sha2cq_tpu.poly.kzg.params import ParamsKZG
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    circuit = PlonkApiCircuit()
    inst = [circuit.A_VALS[0] * circuit.B_VALS[0] % P]
    vk = keygen_vk(params, circuit, compress_selectors=True)
    pk = keygen_pk(params, {}, [], vk, circuit, compress_selectors=True)
    for scheme in ("gwc", "shplonk"):
        proof = create_proof(params, pk, [circuit], [[inst]],
                             rng=random.Random(0x62), multiopen=scheme)
        read = RecordingRead(proof)
        strategy = AccumulatorStrategy(params.verifier_params(),
                                       rng=random.Random(1))
        assert verify_proof(params.verifier_params(), vk, strategy, [[inst]],
                            read, multiopen=scheme).check(), \
            f"fixture proof must verify ({scheme})"
        meta = {
            "circuit": "PlonkApiCircuit (gen_fixtures.py): mul gate + two "
                       "compressed selectors + dynamic lookup + permutation "
                       "+ instance; Rust mirror in crosscheck/rust/"
                       "plonkapi_crosscheck.rs",
            "multiopen": scheme,
            "k": K,
            "toxic_s": hex(s),
            "a_vals": circuit.A_VALS,
            "b_vals": circuit.B_VALS,
            "lookup_table": circuit.TABLE,
            "instances": [inst],
            "challenges": [hex(c) for c in read.challenges],
            "vk_transcript_repr": hex(vk.transcript_repr),
            "vk_pinned_rust": vk._pinned_str_rust(),
        }
        _emit(f"plonkapi_{scheme}", proof, meta, check)


def gen_multicircuit(check: bool) -> None:
    """ONE proof over a TWO-circuit slice (reference
    halo2_proofs/src/plonk/prover.rs:51-60 — `circuits: &[ConcreteCircuit]`
    with phase-major advice commitment interleaving).  Same constraint
    system as gen_plonkapi, two witness/instance sets; the Rust mirror
    (plonkapi_crosscheck.rs multi leg) needs only a two-element circuit
    vector and the doubled instance slice."""
    K = 5
    s = random.Random(0x706170).randrange(P)  # same SRS as plonkapi
    from sha2cq_tpu.poly.kzg.params import ParamsKZG
    params = ParamsKZG.setup_from_toxic_waste(K, s)
    c1 = PlonkApiCircuit()
    a2 = [6, 2, 10, 1, 7]
    b2 = [5, 6, 9, 8, 2]        # b2[1] == a2[0] (copy constraint)
    c2 = PlonkApiCircuit(a2, b2)
    inst1 = [c1.A_VALS[0] * c1.B_VALS[0] % P]
    inst2 = [a2[0] * b2[0] % P]
    vk = keygen_vk(params, c1, compress_selectors=True)
    pk = keygen_pk(params, {}, [], vk, c1, compress_selectors=True)
    proof = create_proof(params, pk, [c1, c2], [[inst1], [inst2]],
                         rng=random.Random(0x63), multiopen="gwc")
    read = RecordingRead(proof)
    strategy = AccumulatorStrategy(params.verifier_params(),
                                   rng=random.Random(1))
    assert verify_proof(params.verifier_params(), vk, strategy,
                        [[inst1], [inst2]], read,
                        multiopen="gwc").check(), \
        "multi-circuit fixture proof must verify"
    meta = {
        "circuit": "PlonkApiCircuit x2 in ONE proof (create_proof over a "
                   "circuit slice, reference plonk/prover.rs:51-60); Rust "
                   "mirror: crosscheck/rust/plonkapi_crosscheck.rs "
                   "multicircuit test",
        "multiopen": "gwc",
        "k": K,
        "toxic_s": hex(s),
        "a_vals": [c1.A_VALS, a2],
        "b_vals": [c1.B_VALS, b2],
        "lookup_table": PlonkApiCircuit.TABLE,
        "instances": [inst1, inst2],
        "challenges": [hex(c) for c in read.challenges],
        "vk_transcript_repr": hex(vk.transcript_repr),
        "vk_pinned_rust": vk._pinned_str_rust(),
        "notes": "instances.txt rows are per-circuit (circuit 0 line, then "
                 "circuit 1 line); the verifier reads advice commitments "
                 "circuit-major within each phase.",
    }
    _emit("plonkapi_multi", proof, meta, check)


if __name__ == "__main__":
    check = "--check" in sys.argv
    gen_mytest(check)
    gen_simple(check)
    gen_plonkapi(check)
    gen_multicircuit(check)

//! Crosscheck: verify sha2cq_tpu's plonk_api-class proofs (fixtures
//! `plonkapi_gwc/` and `plonkapi_shplonk/`) with the REFERENCE verifier.
//!
//! The circuit mirrors crosscheck/gen_fixtures.py PlonkApiCircuit exactly
//! (column/selector creation order, equality enables, gate order, the
//! dynamic lookup, the witness layout): a fixed-gated mul gate, two
//! compressible simple selectors gating add/sub gates, a dynamic lookup of
//! `a` into a fixed table, a copy constraint, and a public instance —
//! the same protocol surface the reference exercises in
//! halo2_proofs/tests/plonk_api.rs:535-564, under BOTH multiopen schemes.
//!
//! Run via crosscheck/run.sh, or manually:
//!   SHA2CQ_FIXTURES=<repo>/crosscheck/fixtures \
//!       cargo test --test plonkapi_crosscheck -- --nocapture

use std::collections::BTreeMap;
use std::fs;
use std::path::PathBuf;

use ff::{Field, PrimeField};
use group::Group;
use halo2_proofs::{
    circuit::{SimpleFloorPlanner, Value},
    plonk::{
        keygen_pk, keygen_vk, verify_proof, Advice, Circuit, Column, Fixed, Instance, Selector,
        TableColumn,
    },
    poly::{
        commitment::ParamsProver,
        kzg::{
            commitment::ParamsKZG,
            multiopen::{VerifierGWC, VerifierSHPLONK},
            strategy::AccumulatorStrategy,
        },
        Rotation, VerificationStrategy,
    },
    transcript::{Blake2bRead, Challenge255, TranscriptReadBuffer},
};
use halo2curves::{
    bn256::{Bn256, Fr},
    pairing::{Engine, MillerLoopResult, MultiMillerLoop},
    FieldExt,
};

fn fixture_dir(name: &str) -> PathBuf {
    PathBuf::from(std::env::var("SHA2CQ_FIXTURES").expect("set SHA2CQ_FIXTURES")).join(name)
}

const TABLE: [u64; 12] = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11];
const A_VALS: [u64; 5] = [3, 7, 5, 8, 9];
const B_VALS: [u64; 5] = [4, 3, 11, 2, 4];

#[derive(Clone)]
struct ApiConfig {
    a: Column<Advice>,
    b: Column<Advice>,
    c: Column<Advice>,
    q_mul: Column<Fixed>,
    table: TableColumn,
    inst: Column<Instance>,
    s_add: Selector,
    s_sub: Selector,
}

#[derive(Clone, Default)]
struct PlonkApiCircuit<E: MultiMillerLoop> {
    _marker: std::marker::PhantomData<E>,
}

impl<E: MultiMillerLoop<Scalar = F>, F: Field + FieldExt> Circuit<E> for PlonkApiCircuit<E> {
    type Config = ApiConfig;
    type FloorPlanner = SimpleFloorPlanner<E>;

    fn without_witnesses(&self) -> Self {
        self.clone()
    }

    fn configure(meta: &mut halo2_proofs::plonk::ConstraintSystem<F>) -> Self::Config {
        // creation order must match gen_fixtures.py PlonkApiCircuit
        let a = meta.advice_column();
        let b = meta.advice_column();
        let c = meta.advice_column();
        let q_mul = meta.fixed_column();
        let table = meta.lookup_table_column();
        let inst = meta.instance_column();
        let s_add = meta.selector();
        let s_sub = meta.selector();
        meta.enable_equality(a);
        meta.enable_equality(b);
        meta.enable_equality(c);
        meta.enable_equality(inst);
        meta.create_gate("mul", |vc| {
            let q = vc.query_fixed(q_mul, Rotation::cur());
            let av = vc.query_advice(a, Rotation::cur());
            let bv = vc.query_advice(b, Rotation::cur());
            let cv = vc.query_advice(c, Rotation::cur());
            vec![q * (av * bv - cv)]
        });
        meta.create_gate("add", |vc| {
            let s = vc.query_selector(s_add);
            let av = vc.query_advice(a, Rotation::cur());
            let bv = vc.query_advice(b, Rotation::cur());
            let cv = vc.query_advice(c, Rotation::cur());
            vec![s * (av + bv - cv)]
        });
        meta.create_gate("sub", |vc| {
            let s = vc.query_selector(s_sub);
            let av = vc.query_advice(a, Rotation::cur());
            let bv = vc.query_advice(b, Rotation::cur());
            let cv = vc.query_advice(c, Rotation::cur());
            vec![s * (av - bv - cv)]
        });
        meta.lookup("range", |vc| vec![(vc.query_advice(a, Rotation::cur()), table)]);
        ApiConfig { a, b, c, q_mul, table, inst, s_add, s_sub }
    }

    fn synthesize(
        &self,
        config: Self::Config,
        mut layouter: impl halo2_proofs::circuit::Layouter<F, E = E>,
    ) -> Result<(), halo2_proofs::plonk::Error> {
        layouter.assign_table(
            || "range",
            |mut table| {
                for (i, v) in TABLE.iter().enumerate() {
                    table.assign_cell(|| "v", config.table, i, || Value::known(F::from(*v)))?;
                }
                Ok(())
            },
        )?;
        let cc0 = layouter.assign_region(
            || "rows",
            |mut region| {
                let mut first_a = None;
                let mut first_c = None;
                for (i, (av, bv)) in A_VALS.iter().zip(B_VALS.iter()).enumerate() {
                    let cv;
                    if i < 3 {
                        region.assign_fixed(config.q_mul, i, F::one());
                        cv = F::from(*av) * F::from(*bv);
                    } else if i == 3 {
                        config.s_add.enable(&mut region, i)?;
                        cv = F::from(*av) + F::from(*bv);
                    } else {
                        config.s_sub.enable(&mut region, i)?;
                        cv = F::from(*av) - F::from(*bv);
                    }
                    let ca = region.assign_advice(config.a, i, Value::known(F::from(*av)))?;
                    let cb = region.assign_advice(config.b, i, Value::known(F::from(*bv)))?;
                    let cc = region.assign_advice(config.c, i, Value::known(cv))?;
                    if i == 0 {
                        first_a = Some(ca);
                        first_c = Some(cc);
                    }
                    if i == 1 {
                        // copy constraint: b[1] == a[0]
                        region.constrain_equal(first_a.as_ref().unwrap().cell(), cb.cell());
                    }
                }
                Ok(first_c.unwrap())
            },
        )?;
        layouter.constrain_instance(*cc0.cell(), config.inst, 0);
        Ok(())
    }
}

fn run(name: &str, shplonk: bool) {
    const K: u32 = 5;
    let dir = fixture_dir(name);
    let s_dec = fs::read_to_string(dir.join("s_dec.txt")).unwrap();
    let s = Fr::from_str_vartime(s_dec.trim()).expect("bad s_dec.txt");
    let proof = fs::read(dir.join("proof.bin")).unwrap();
    // one line per circuit in the proof slice (single-circuit fixtures
    // have one line; plonkapi_multi has two — prover.rs:51-60)
    let per_circuit: Vec<Vec<Fr>> = fs::read_to_string(dir.join("instances.txt"))
        .unwrap()
        .lines()
        .filter(|l| !l.trim().is_empty())
        .map(|l| {
            l.split_whitespace()
                .map(|w| Fr::from_str_vartime(w).unwrap())
                .collect()
        })
        .collect();

    let circuit = PlonkApiCircuit::<Bn256> { _marker: Default::default() };
    let params = ParamsKZG::<Bn256>::setup_from_toxic_waste(K, s);
    let vk = keygen_vk(&params, &circuit).expect("keygen_vk");

    let pinned = format!("{:?}", vk.pinned());
    let expected = fs::read_to_string(dir.join("vk_pinned_rust.txt")).unwrap();
    assert_eq!(pinned, expected, "pinned VK mismatch for PlonkApiCircuit");

    let pk = keygen_pk(&params, BTreeMap::new(), vec![], vk, &circuit).expect("keygen_pk");

    let mut transcript = Blake2bRead::<_, _, Challenge255<_>>::init(&proof[..]);
    let verifier_params = params.verifier_params();
    let col_slices: Vec<Vec<&[Fr]>> =
        per_circuit.iter().map(|cols| vec![&cols[..]]).collect();
    let instance_slices: Vec<&[&[Fr]]> =
        col_slices.iter().map(|c| &c[..]).collect();
    let tuples = if shplonk {
        let strategy = VerificationStrategy::<Bn256, VerifierSHPLONK<_>>::new(verifier_params);
        let batcher = verify_proof::<
            Bn256,
            VerifierSHPLONK<_>,
            _,
            Blake2bRead<_, _, Challenge255<_>>,
            AccumulatorStrategy<_>,
        >(
            verifier_params,
            pk.get_vk(),
            strategy,
            &instance_slices[..],
            &mut transcript,
        )
        .expect("verify_proof (shplonk)");
        batcher.finalize()
    } else {
        let strategy = VerificationStrategy::<Bn256, VerifierGWC<_>>::new(verifier_params);
        let batcher = verify_proof::<
            Bn256,
            VerifierGWC<_>,
            _,
            Blake2bRead<_, _, Challenge255<_>>,
            AccumulatorStrategy<_>,
        >(
            verifier_params,
            pk.get_vk(),
            strategy,
            &instance_slices[..],
            &mut transcript,
        )
        .expect("verify_proof (gwc)");
        batcher.finalize()
    };

    let result =
        Bn256::multi_miller_loop(&tuples.iter().map(|(g1, g2)| (g1, g2)).collect::<Vec<_>>());
    assert!(
        bool::from(result.final_exponentiation().is_identity()),
        "pairing identity failed: sha2cq_tpu {name} proof rejected"
    );
    println!("OK: sha2cq_tpu {name} proof accepted by the reference verifier");
}

#[test]
fn sha2cq_tpu_plonkapi_gwc_proof_verifies() {
    run("plonkapi_gwc", false);
}

#[test]
fn sha2cq_tpu_plonkapi_shplonk_proof_verifies() {
    run("plonkapi_shplonk", true);
}

#[test]
fn sha2cq_tpu_plonkapi_multicircuit_proof_verifies() {
    // ONE proof over a TWO-circuit slice (plonk/prover.rs:51-60): the
    // verifier only needs the doubled instance slice — advice commitments
    // are read circuit-major within each phase (verifier.rs:105-131)
    run("plonkapi_multi", false);
}

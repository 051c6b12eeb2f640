//! Crosscheck: verify sha2cq_tpu's gate+permutation+instance proof
//! (fixture `simple/`) with the REFERENCE verifier.
//!
//! The circuit mirrors sha2cq_tpu/models/simple.py exactly (column creation
//! order, equality enables, the one gate, the witness layout) — covering the
//! non-lookup protocol surface: custom gate, copy constraints, public
//! instance, vanishing argument, GWC multiopen.
//!
//! Run via crosscheck/run.sh, or manually:
//!   SHA2CQ_FIXTURES=<repo>/crosscheck/fixtures \
//!       cargo test --test simple_crosscheck -- --nocapture

use std::collections::BTreeMap;
use std::fs;
use std::path::PathBuf;

use ff::{Field, PrimeField};
use group::Group;
use halo2_proofs::{
    circuit::{SimpleFloorPlanner, Value},
    plonk::{
        keygen_pk, keygen_vk, verify_proof, Advice, Circuit, Column, Fixed, Instance,
    },
    poly::{
        commitment::ParamsProver,
        kzg::{
            commitment::ParamsKZG, multiopen::VerifierGWC, strategy::AccumulatorStrategy,
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

fn fixture_dir() -> PathBuf {
    PathBuf::from(std::env::var("SHA2CQ_FIXTURES").expect("set SHA2CQ_FIXTURES")).join("simple")
}

#[derive(Clone)]
struct SimpleConfig {
    a: Column<Advice>,
    b: Column<Advice>,
    inst: Column<Instance>,
    q: Column<Fixed>,
}

#[derive(Clone, Default)]
struct SimpleCircuit<E: MultiMillerLoop> {
    a0: u64,
    b0: u64,
    _marker: std::marker::PhantomData<E>,
}

impl<E: MultiMillerLoop<Scalar = F>, F: Field + FieldExt> Circuit<E> for SimpleCircuit<E> {
    type Config = SimpleConfig;
    type FloorPlanner = SimpleFloorPlanner<E>;

    fn without_witnesses(&self) -> Self {
        self.clone()
    }

    fn configure(meta: &mut halo2_proofs::plonk::ConstraintSystem<F>) -> Self::Config {
        // column creation + equality order must match models/simple.py
        let a = meta.advice_column();
        let b = meta.advice_column();
        let inst = meta.instance_column();
        let q = meta.fixed_column();
        meta.enable_equality(a);
        meta.enable_equality(b);
        meta.enable_equality(inst);
        meta.create_gate("cross", |vc| {
            let qv = vc.query_fixed(q, Rotation::cur());
            let av = vc.query_advice(a, Rotation::cur());
            let bv = vc.query_advice(b, Rotation::next());
            vec![qv * (av - bv)]
        });
        SimpleConfig { a, b, inst, q }
    }

    fn synthesize(
        &self,
        config: Self::Config,
        mut layouter: impl halo2_proofs::circuit::Layouter<F, E = E>,
    ) -> Result<(), halo2_proofs::plonk::Error> {
        let ca = layouter.assign_region(
            || "simple",
            |mut region| {
                region.assign_fixed(config.q, 0, F::one());
                let ca = region.assign_advice(config.a, 0, Value::known(F::from(self.a0)))?;
                region.assign_advice(config.b, 0, Value::known(F::from(self.b0)))?;
                region.assign_advice(config.b, 1, Value::known(F::from(self.a0)))?;
                Ok(ca)
            },
        )?;
        layouter.constrain_instance(*ca.cell(), config.inst, 1);
        Ok(())
    }
}

#[test]
fn sha2cq_tpu_simple_proof_verifies() {
    const K: u32 = 4;
    let dir = fixture_dir();
    let s_dec = fs::read_to_string(dir.join("s_dec.txt")).unwrap();
    let s = Fr::from_str_vartime(s_dec.trim()).expect("bad s_dec.txt");
    let proof = fs::read(dir.join("proof.bin")).unwrap();
    let instances: Vec<Fr> = fs::read_to_string(dir.join("instances.txt"))
        .unwrap()
        .split_whitespace()
        .map(|w| Fr::from_str_vartime(w).unwrap())
        .collect();

    let circuit = SimpleCircuit::<Bn256> { a0: 7, b0: 11, _marker: Default::default() };
    let params = ParamsKZG::<Bn256>::setup_from_toxic_waste(K, s);
    let vk = keygen_vk(&params, &circuit).expect("keygen_vk");

    let pinned = format!("{:?}", vk.pinned());
    let expected = fs::read_to_string(dir.join("vk_pinned_rust.txt")).unwrap();
    assert_eq!(pinned, expected, "pinned VK mismatch for SimpleCircuit");

    let pk = keygen_pk(&params, BTreeMap::new(), vec![], vk, &circuit).expect("keygen_pk");

    let mut transcript = Blake2bRead::<_, _, Challenge255<_>>::init(&proof[..]);
    let verifier_params = params.verifier_params();
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
        &[&[&instances[..]]],
        &mut transcript,
    )
    .expect("verify_proof");

    let tuples = batcher.finalize();
    let result =
        Bn256::multi_miller_loop(&tuples.iter().map(|(g1, g2)| (g1, g2)).collect::<Vec<_>>());
    assert!(
        bool::from(result.final_exponentiation().is_identity()),
        "pairing identity failed: sha2cq_tpu simple proof rejected"
    );
    println!("OK: sha2cq_tpu simple proof accepted by the reference verifier");
}

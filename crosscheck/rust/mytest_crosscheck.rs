//! Crosscheck: verify the sha2cq_tpu framework's my_test-equivalent proof
//! with the REFERENCE verifier.
//!
//! Drop this file into `<reference>/halo2_proofs/tests/` (crosscheck/run.sh
//! does that into a scratch copy) and run
//!   SHA2CQ_FIXTURES=<repo>/crosscheck/fixtures \
//!       cargo test --test mytest_crosscheck -- --nocapture
//!
//! The circuit is the reference's own `MyCircuit`
//! (halo2_proofs/tests/my_test.rs:43-110); only the toxic waste `s`, the
//! proof bytes, and the expected pinned-VK string come from the fixtures
//! (crosscheck/gen_fixtures.py in the sha2cq_tpu repo).

use std::collections::BTreeMap;
use std::fs;
use std::path::PathBuf;

use ff::{Field, PrimeField};
use group::Group;
use halo2_proofs::{
    circuit::{SimpleFloorPlanner, Value},
    plonk::{
        keygen_pk, keygen_vk,
        static_lookup::{StaticTable, StaticTableConfig, StaticTableId, StaticTableValues},
        verify_proof, Advice, Circuit, Column,
    },
    poly::{
        commitment::ParamsProver,
        kzg::{
            commitment::{ParamsKZG, TableSRS},
            multiopen::VerifierGWC,
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

fn fixture_dir() -> PathBuf {
    PathBuf::from(std::env::var("SHA2CQ_FIXTURES").expect("set SHA2CQ_FIXTURES")).join("mytest")
}

#[derive(Clone)]
struct MyCircuit<E: MultiMillerLoop> {
    table: StaticTable<E>,
    table_2: StaticTable<E>,
}

impl<E: MultiMillerLoop<Scalar = F>, F: Field + FieldExt> Circuit<E> for MyCircuit<E> {
    type Config = (Column<Advice>, Column<Advice>);
    type FloorPlanner = SimpleFloorPlanner<E>;

    fn without_witnesses(&self) -> Self {
        self.clone()
    }

    fn configure(meta: &mut halo2_proofs::plonk::ConstraintSystem<F>) -> Self::Config {
        let advice = meta.advice_column();
        let advice_2 = meta.advice_column();
        meta.lookup_static("lookup_bits", |meta| {
            vec![
                (
                    meta.query_advice(advice, Rotation::cur()),
                    StaticTableId(String::from("table")),
                ),
                (
                    meta.query_advice(advice_2, Rotation::cur()),
                    StaticTableId(String::from("table_2")),
                ),
            ]
        });
        (advice, advice_2)
    }

    fn synthesize(
        &self,
        config: Self::Config,
        mut layouter: impl halo2_proofs::circuit::Layouter<F, E = E>,
    ) -> Result<(), halo2_proofs::plonk::Error> {
        layouter.register_static_table(StaticTableId(String::from("table")), self.table.clone());
        layouter
            .register_static_table(StaticTableId(String::from("table_2")), self.table_2.clone());
        // same witness the fixture proof was produced from
        layouter.assign_region(
            || "",
            |mut region| {
                region.assign_advice(config.0, 0, Value::known(F::from_u128(30)))?;
                region.assign_advice(config.0, 1, Value::known(F::from_u128(6)))?;
                region.assign_advice(config.1, 0, Value::known(F::from_u128(15)))?;
                region.assign_advice(config.1, 1, Value::known(F::from_u128(3)))?;
                Ok(())
            },
        )?;
        Ok(())
    }
}

fn build_tables(srs: &TableSRS<Bn256>, n: usize) -> (StaticTable<Bn256>, StaticTable<Bn256>) {
    let t1: Vec<Fr> = [0u64, 1, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32]
        .iter()
        .map(|&v| Fr::from(v))
        .collect();
    let t2: Vec<Fr> = [0u64, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
        .iter()
        .map(|&v| Fr::from(v))
        .collect();
    let v1 = StaticTableValues::new(&t1, &srs.g1());
    let v2 = StaticTableValues::new(&t2, &srs.g1());
    let c1 = v1.commit(srs.g1().len(), srs.g2(), n);
    let c2 = v2.commit(srs.g1().len(), srs.g2(), n);
    (
        StaticTable { opened: Some(v1), committed: Some(c1) },
        StaticTable { opened: Some(v2), committed: Some(c2) },
    )
}

#[test]
fn sha2cq_tpu_mytest_proof_verifies() {
    const K: u32 = 3;
    let dir = fixture_dir();
    let s_dec = fs::read_to_string(dir.join("s_dec.txt")).unwrap();
    let s = Fr::from_str_vartime(s_dec.trim()).expect("bad s_dec.txt");
    let proof = fs::read(dir.join("proof.bin")).unwrap();

    let table_n = 16usize;
    let srs = TableSRS::<Bn256>::setup_from_toxic_waste(table_n - 1, table_n, s);
    let (table, table_2) = build_tables(&srs, 1 << K);
    let circuit = MyCircuit::<Bn256> { table, table_2 };

    let params = ParamsKZG::<Bn256>::setup_from_toxic_waste(K, s);
    let config = StaticTableConfig::new(
        table_n,
        srs.g1_lagrange().to_vec(),
        srs.g_lagrange_opening_at_0().to_vec(),
    );
    let mut configs = BTreeMap::new();
    configs.insert(table_n, config);
    let b0_g1_bound = srs.g1()[((1 << K) + 1)..].to_vec();

    let vk = keygen_vk(&params, &circuit).expect("keygen_vk");

    // 1) the pinned VK must match what the sha2cq_tpu keygen predicted
    let pinned = format!("{:?}", vk.pinned());
    let expected = fs::read_to_string(dir.join("vk_pinned_rust.txt")).unwrap();
    assert_eq!(
        pinned, expected,
        "pinned VK mismatch: the Python keygen does not reproduce the \
         reference keygen for MyCircuit"
    );

    let pk = keygen_pk(&params, configs, b0_g1_bound, vk, &circuit).expect("keygen_pk");

    // 2) the fixture proof must verify under the reference verifier
    let mut transcript = Blake2bRead::<_, _, Challenge255<_>>::init(&proof[..]);
    let verifier_params = params.verifier_params();
    let strategy = VerificationStrategy::<Bn256, VerifierGWC<_>>::new(verifier_params);
    let batcher = verify_proof::<
        Bn256,
        VerifierGWC<_>,
        _,
        Blake2bRead<_, _, Challenge255<_>>,
        AccumulatorStrategy<_>,
    >(verifier_params, pk.get_vk(), strategy, &[&[]], &mut transcript)
    .expect("verify_proof");

    let tuples = batcher.finalize();
    let result =
        Bn256::multi_miller_loop(&tuples.iter().map(|(g1, g2)| (g1, g2)).collect::<Vec<_>>());
    assert!(
        bool::from(result.final_exponentiation().is_identity()),
        "pairing identity failed: sha2cq_tpu proof rejected by reference verifier"
    );
    println!("OK: sha2cq_tpu my_test proof accepted by the reference verifier");
}

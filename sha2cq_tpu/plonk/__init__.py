"""PLONK protocol layer (reference halo2_proofs/src/plonk/)."""
from .circuit_ir import (Challenge, Column, ConstraintSystem, Expression,
                         Selector, StaticTableId, TableColumn)
from .keygen import keygen_pk, keygen_vk
from .keys import ProvingKey, VerifyingKey
from .prover import create_proof, prewarm_prover
from .static_tables import (StaticCommittedTable, StaticTable,
                            StaticTableConfig, StaticTableValues)
from .verifier import verify_proof

__all__ = [
    "Challenge", "Column", "ConstraintSystem", "Expression", "Selector",
    "StaticTableId", "TableColumn", "keygen_pk", "keygen_vk", "ProvingKey",
    "VerifyingKey", "create_proof", "prewarm_prover", "StaticCommittedTable", "StaticTable",
    "StaticTableConfig", "StaticTableValues", "verify_proof",
]

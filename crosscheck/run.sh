#!/usr/bin/env bash
# Crosscheck sha2cq_tpu proofs against the reference Rust verifier.
#
# Needs: a Rust toolchain able to build the reference (nightly-2022-10-28,
# see <reference>/rust-toolchain) and crate registry access (or a vendored
# registry).  Neither exists in the build container — this script is the
# one-shot entry point for a machine that has them.
#
# Usage: crosscheck/run.sh [path-to-reference]   (default /root/reference)
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${1:-/root/reference}"
command -v cargo >/dev/null || { echo "SKIP: no cargo toolchain"; exit 2; }
[ -d "$REF/halo2_proofs" ] || { echo "ERROR: reference not at $REF"; exit 1; }

# the reference tree may be read-only: build from a scratch copy
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT
cp -r "$REF" "$WORK/reference"
cp "$HERE"/rust/*.rs "$WORK/reference/halo2_proofs/tests/"

export SHA2CQ_FIXTURES="$HERE/fixtures"
cd "$WORK/reference"
cargo test -p halo2_proofs --test mytest_crosscheck --test simple_crosscheck \
    --test plonkapi_crosscheck -- --nocapture
echo "CROSSCHECK OK: all sha2cq_tpu fixture proofs accepted by the reference verifier"

"""The Rust-crosscheck fixtures must never go stale: regenerating them from
the live stack must reproduce the committed bytes exactly (crosscheck/README.md).

If a change MEANT to alter proof bytes lands (protocol change, pinned-VK
format change), regenerate with `python crosscheck/gen_fixtures.py` in the
same commit and say why.
"""
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fixtures_match_live_stack():
    sys.path.insert(0, os.path.join(REPO, "crosscheck"))
    import gen_fixtures

    gen_fixtures.gen_mytest(check=True)
    gen_fixtures.gen_simple(check=True)
    gen_fixtures.gen_plonkapi(check=True)
    gen_fixtures.gen_multicircuit(check=True)


@pytest.mark.skipif(shutil.which("cargo") is None,
                    reason="no Rust toolchain in this environment")
def test_reference_verifier_accepts_fixture_proofs():
    """The actual oracle run — executes only where cargo exists."""
    res = subprocess.run(["bash", os.path.join(REPO, "crosscheck", "run.sh")],
                         capture_output=True, text=True, timeout=3600)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "CROSSCHECK OK" in res.stdout

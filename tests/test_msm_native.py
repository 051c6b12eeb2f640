"""Native MSM plumbing: the multi-job batcher and the packed-basis disk
cache (the cold-process fix for seconds of bigint marshalling per fresh
prover, see ops/msm.packed_basis).  Reference counterpart:
halo2_proofs/src/arithmetic.rs:13-159 (best_multiexp); the batching and
disk marshalling are greenfield (Rust pays no per-process marshal tax)."""
import random

import pytest

from sha2cq_tpu.curves import host as CH
from sha2cq_tpu.fields.host import FR_MOD
from sha2cq_tpu.native_loader import get_lib
from sha2cq_tpu.ops import msm as M

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


def _points(n, seed=1):
    rng = random.Random(seed)
    return [CH.g1_mul(CH.G1_GEN, rng.randrange(1, FR_MOD)) for _ in range(n)]


def _host_msm(scalars, pts):
    acc = None
    for s, p in zip(scalars, pts):
        acc = CH.g1_add(acc, CH.g1_mul(p, s % FR_MOD))
    return acc


def test_msm_multi_matches_host_oracle():
    rng = random.Random(7)
    pts = _points(64)

    class Holder:
        pass

    holder = Holder()
    packed = M.packed_basis(holder, "_p", pts)
    jobs = [
        (packed, None, [rng.randrange(FR_MOD) for _ in range(64)], pts),
        (packed, [3, 9, 41], [rng.randrange(FR_MOD) for _ in range(3)], pts),
        (packed, None, [], pts),                      # empty -> None
    ]
    dense, sparse, empty = M.msm_multi(jobs)
    assert dense == _host_msm(jobs[0][2], pts)
    assert sparse == _host_msm(jobs[1][2], [pts[i] for i in jobs[1][1]])
    assert empty is None


def test_msm_grouped_multi_matches_host_oracle():
    """g1_msm_grouped_multi: per-group point sums then Pippenger over the
    group sums must equal the flat per-row MSM with duplicated scalars.
    Covers duplicate points inside a group (the mixed-add doubling branch),
    single-row groups, and an empty job."""
    import numpy as np

    from sha2cq_tpu.native_loader import fr_buf

    rng = random.Random(11)
    pts = _points(40, seed=5)
    pts[7] = pts[3]          # duplicate point, same group below

    class Holder:
        pass

    packed = M.packed_basis(Holder(), "_p", pts)
    gids = [rng.randrange(6) for _ in range(40)]
    gids[3] = gids[7] = 2    # equal points in one group -> doubling path
    gsc = [rng.randrange(FR_MOD) for _ in range(6)]
    order = np.argsort(np.array(gids), kind="stable").astype(np.int64)
    counts = np.bincount(np.array(gids), minlength=6)
    starts = np.zeros(7, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])

    (res, empty) = M.msm_grouped_multi([
        (packed, order, starts, fr_buf(gsc)),
        (packed, np.zeros(0, np.int64), np.zeros(1, np.int64),
         np.zeros((0, 4), "<u8")),
    ])
    expect = _host_msm([gsc[g] for g in gids], pts)
    assert res == expect
    assert empty is None


def test_packed_basis_disk_cache_roundtrip(tmp_path, monkeypatch):
    """Second process (simulated: fresh holder object) must read the packed
    bytes back from disk identically to a fresh marshal."""
    monkeypatch.setenv("SHA2CQ_CACHE", str(tmp_path))
    monkeypatch.setattr(M, "DISK_BASIS_MIN", 32)
    pts = _points(48, seed=3)

    class A:
        pass

    class B:
        pass

    first = M.packed_basis(A(), "_x", pts)
    cached = list(tmp_path.glob("packedbasis_*.bin"))
    assert len(cached) == 1, "one disk blob written"
    second = M.packed_basis(B(), "_x", pts)
    assert bytes(first) == bytes(second)

    # and the cached basis actually computes the right commitment
    sc = [5, 7, 11]
    got = M.msm_multi([(second, [0, 2, 4], sc, pts)])[0]
    assert got == _host_msm(sc, [pts[0], pts[2], pts[4]])


def test_packed_basis_corrupt_file_falls_back(tmp_path, monkeypatch):
    """A truncated/garbage cache file must be ignored, not trusted."""
    monkeypatch.setenv("SHA2CQ_CACHE", str(tmp_path))
    monkeypatch.setattr(M, "DISK_BASIS_MIN", 32)
    pts = _points(40, seed=5)

    class A:
        pass

    first = M.packed_basis(A(), "_x", pts)
    path = next(tmp_path.glob("packedbasis_*.bin"))
    path.write_bytes(b"garbage")

    class B:
        pass

    second = M.packed_basis(B(), "_x", pts)
    assert bytes(first) == bytes(second)


def test_msm_combined_matches_split_paths():
    """msm_combined (one g1_msm_unified call) must return exactly what the
    split msm_multi + msm_grouped_multi paths return, in jobs+gjobs order,
    including empty jobs on both sides."""
    import numpy as np

    from sha2cq_tpu.native_loader import fr_buf

    rng = random.Random(23)
    pts = _points(48, seed=9)

    class Holder:
        pass

    packed = M.packed_basis(Holder(), "_p", pts)
    jobs = [
        (packed, None, [rng.randrange(FR_MOD) for _ in range(48)], pts),
        (packed, [1, 17, 30, 30], [rng.randrange(FR_MOD) for _ in range(4)],
         pts),
        (packed, None, [], pts),
    ]
    gids = [rng.randrange(5) for _ in range(48)]
    gsc = [rng.randrange(FR_MOD) for _ in range(5)]
    order = np.argsort(np.array(gids), kind="stable").astype(np.int64)
    counts = np.bincount(np.array(gids), minlength=5)
    starts = np.zeros(6, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    gjobs = [
        (packed, order, starts, fr_buf(gsc)),
        (packed, np.zeros(0, np.int64), np.zeros(1, np.int64),
         np.zeros((0, 4), "<u8")),
    ]
    combined = M.msm_combined(jobs, gjobs)
    split = M.msm_multi(jobs) + M.msm_grouped_multi(gjobs)
    assert combined == split
    assert combined[0] == _host_msm(jobs[0][2], pts)
    assert combined[3] == _host_msm([gsc[g] for g in gids], pts)
    assert combined[2] is None and combined[4] is None

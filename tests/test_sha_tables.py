"""SHA table semantics vs the reference's committed test vectors
(sha/src/tables.rs:156-212 TestLimbs tests, sha-reference/src/lib.rs:45-80)."""
from sha2cq_tpu.models.sha import reference as R
from sha2cq_tpu.models.sha.tables import (TEST_LIMBS, SHORT_LIMBS,
                                          create_ch_table,
                                          create_decomposition_table,
                                          create_maj_table, create_rot0_table,
                                          create_rot1_table)


def test_rot0_vectors():
    table = create_rot0_table(TEST_LIMBS)
    assert len(table) == 256
    assert (0, 0, 0, 0) in table
    assert (0b0000_1100, 0b01, 0b00, 0b0000_0100) in table
    assert (0b0000_1010, 0b01, 0b10, 0b0000_0110) in table


def test_rot1_vectors():
    table = create_rot1_table(TEST_LIMBS)
    assert len(table) == 256
    assert (0, 0, 0, 0) in table
    assert (0b0000_1100, 0b01, 0b00, 0b1110_1001) in table
    assert (0b0000_1010, 0b01, 0b10, 0b0001_1101) in table


def test_maj_ch_vectors():
    maj = create_maj_table(TEST_LIMBS)
    assert len(maj) == 256
    assert (0b0000_1100, 0b01, 0b00, 0b0000_0000) in maj
    assert (0b0000_1010, 0b01, 0b10, 0b0000_0010) in maj
    ch = create_ch_table(TEST_LIMBS)
    assert (0b0000_1100, 0b01, 0b00, 0b0000_0000) in ch
    assert (0b0000_1010, 0b01, 0b10, 0b0000_0000) in ch


def test_decomposition_vectors():
    table = create_decomposition_table(TEST_LIMBS, 10)
    assert len(table) == 1024
    assert (0, 0, 0, 0) in table
    assert (0b10_1010_1010, 0b0000_1010, 0b10, 0b10) in table
    assert (0b11_1011_0110, 0b0000_1011, 0b01, 0b10) in table


def test_short_limbs_table_sizes():
    assert len(create_rot0_table(SHORT_LIMBS)) == 1 << 16
    assert len(create_decomposition_table(SHORT_LIMBS, 17)) == 1 << 17


def test_sha_round_model():
    """lib.rs:45-80 test_single_round at L=2."""
    s = R.Octet(a=0b00, b=0b01, c=0b10, d=0b11, e=0b00, f=0b01, g=0b10, h=0b11)
    out = R.sha_round(s, bits=2)
    assert out.b == 0b00 and out.c == 0b01 and out.d == 0b10
    assert out.f == 0b00 and out.g == 0b01 and out.h == 0b10
    assert out.e == 0b10
    assert out.a == 0b01


def test_tables_consistent_with_model():
    """rot tables agree with the sha-reference rot functions on full words."""
    l = TEST_LIMBS
    table = {(x, y, z): f for x, y, z, f in create_rot0_table(l)}
    for w in [0b1100_0101, 0b0110_1001, 0xFF, 0x01]:
        x = w >> (2 * l.second)
        y = (w >> l.second) & ((1 << l.second) - 1)
        z = w & ((1 << l.second) - 1)
        assert table[(x, y, z)] == R.rot_0(w, l.word_len)

"""Constellation parity vs the reference's exact dictionaries
(`/root/reference/dev/py/ofdm.py:24-78`) — values restated independently here
as the test oracle."""
import numpy as np
import pytest

from dl_ofdm_tpu.ofdm import constellation as C

# oracle: the reference mapping dicts, keyed by bit tuple
REF_BPSK = {(0,): -4.24264 + 0j, (1,): 4.24264 + 0j}
REF_QPSK = {(0, 0): -3 + 3j, (1, 0): -3 - 3j, (0, 1): 3 + 3j, (1, 1): 3 - 3j}
_S8 = 4.2426 / 3.1623
REF_8QAM = {(0, 0, 0): (-3 + 1j) * _S8, (1, 0, 0): (-3 - 1j) * _S8,
            (0, 1, 0): (-1 + 1j) * _S8, (1, 1, 0): (-1 - 1j) * _S8,
            (0, 0, 1): (3 + 1j) * _S8, (1, 0, 1): (3 - 1j) * _S8,
            (0, 1, 1): (1 + 1j) * _S8, (1, 1, 1): (1 - 1j) * _S8}
REF_16QAM = {
    (0, 0, 0, 0): -3 + 3j, (1, 0, 0, 0): -3 + 1j, (0, 1, 0, 0): -3 - 3j,
    (1, 1, 0, 0): -3 - 1j, (0, 0, 1, 0): -1 + 3j, (1, 0, 1, 0): -1 + 1j,
    (0, 1, 1, 0): -1 - 3j, (1, 1, 1, 0): -1 - 1j, (0, 0, 0, 1): 3 + 3j,
    (1, 0, 0, 1): 3 + 1j, (0, 1, 0, 1): 3 - 3j, (1, 1, 0, 1): 3 - 1j,
    (0, 0, 1, 1): 1 + 3j, (1, 0, 1, 1): 1 + 1j, (0, 1, 1, 1): 1 - 3j,
    (1, 1, 1, 1): 1 - 1j}
REF_MAPS = {1: REF_BPSK, 2: REF_QPSK, 3: REF_8QAM, 4: REF_16QAM}


@pytest.mark.parametrize("nbits", [1, 2, 3, 4])
def test_table_matches_reference_dicts(nbits):
    table = np.asarray(C.const_table(nbits))
    for bits, val in REF_MAPS[nbits].items():
        # packbits-compatible index: big-endian bit tuple
        idx = int("".join(map(str, bits)), 2)
        assert table[idx] == pytest.approx(val, abs=1e-5), (bits, idx)


@pytest.mark.parametrize("nbits", [1, 2, 3, 4])
def test_packbits_index_equivalence(nbits, rng):
    """indices_from_bits must equal the reference's np.packbits path
    (`ofdm.py:293-298`)."""
    bits = rng.integers(0, 2, (100, nbits))
    padded = np.pad(bits, [(0, 0), (8 - nbits, 0)])
    ref_idx = np.packbits(padded, axis=1).ravel()
    got = np.asarray(C.indices_from_bits(bits))
    np.testing.assert_array_equal(got, ref_idx)


@pytest.mark.parametrize("nbits", [1, 2, 3, 4])
def test_bits_roundtrip(nbits, rng):
    bits = rng.integers(0, 2, (64, nbits))
    idx = C.indices_from_bits(bits)
    back = np.asarray(C.bits_from_indices(idx, nbits))
    np.testing.assert_array_equal(back, bits)


@pytest.mark.parametrize("nbits", [1, 2, 3, 4])
def test_demod_nearest_inverts_modulation(nbits, rng):
    bits = rng.integers(0, 2, (256, nbits))
    syms = C.bits_to_symbols(bits)
    idx = C.demod_nearest(syms, C.const_table(nbits))
    back = np.asarray(C.bits_from_indices(idx, nbits))
    np.testing.assert_array_equal(back, bits)


def test_matlab_gray_is_gray_coded():
    """Adjacent (min-distance) constellation points differ by one bit."""
    for m in (4, 8, 16):
        table = np.asarray(C.matlab_gray_table(m))
        nbits = int(np.log2(m))
        for a in range(m):
            d = np.abs(table - table[a])
            d[a] = np.inf
            for b in np.where(np.isclose(d, d.min()))[0]:
                diff = bin(int(f"{a:0{nbits}b}", 2) ^
                           int(f"{b:0{nbits}b}", 2)).count("1")
                assert diff == 1, (m, a, b)


def test_matlab_qpsk_values():
    """qammod(0:3, 4, 'gray') oracle."""
    table = np.asarray(C.matlab_gray_table(4))
    np.testing.assert_allclose(
        table, [-1 + 1j, -1 - 1j, 1 + 1j, 1 - 1j], atol=1e-6)

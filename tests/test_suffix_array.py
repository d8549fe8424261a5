import numpy as np
import pytest

from tpufm.index.suffix_array import (
    suffix_array_doubling,
    suffix_array_naive,
    suffix_array_native,
)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 10, 100, 1000])
def test_doubling_matches_naive(rng, n):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    np.testing.assert_array_equal(
        suffix_array_doubling(codes), suffix_array_naive(codes)
    )


def test_repetitive_text(rng):
    # Heavy repeats stress rank-compression and LMS naming.
    for pat in [b"\x00", b"\x00\x01", b"\x03\x03\x00", b"\x00\x01\x02\x03"]:
        codes = np.frombuffer(pat * 200, dtype=np.uint8).copy()
        np.testing.assert_array_equal(
            suffix_array_doubling(codes), suffix_array_naive(codes)
        )


def test_native_matches_doubling(rng):
    native_probe = suffix_array_native(np.zeros(4, dtype=np.uint8))
    if native_probe is None:
        pytest.skip("native SA-IS library unavailable")
    for n in [1, 2, 5, 37, 1000, 20000]:
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        np.testing.assert_array_equal(
            suffix_array_native(codes), suffix_array_doubling(codes)
        )
    for pat in [b"\x00", b"\x01\x00", b"\x02\x02\x01\x00"]:
        codes = np.frombuffer(pat * 500, dtype=np.uint8).copy()
        np.testing.assert_array_equal(
            suffix_array_native(codes), suffix_array_doubling(codes)
        )


def test_sentinel_rank_zero(rng):
    codes = rng.integers(0, 4, size=64, dtype=np.uint8)
    sa = suffix_array_doubling(codes)
    assert sa[0] == 64  # the '$' suffix sorts first
    assert sorted(sa.tolist()) == list(range(65))


def test_native_large_random(rng):
    # ~1M-base random text: exercises deep SA-IS recursion levels.
    if suffix_array_native(np.zeros(4, dtype=np.uint8)) is None:
        pytest.skip("native SA-IS library unavailable")
    codes = rng.integers(0, 4, size=1_000_000, dtype=np.uint8)
    sa = suffix_array_native(codes)
    assert sa[0] == 1_000_000
    # spot-check sortedness at 1000 random adjacent pairs
    idx = rng.integers(1, 1_000_000, size=1000)
    for i in idx:
        a, b = int(sa[i]), int(sa[i + 1])
        assert codes.tobytes()[a:a+64] <= codes.tobytes()[b:b+64]


def test_native_rejects_byte_255(rng):
    # 255 + 1 would wrap to the sentinel symbol; the library must refuse,
    # not silently return a wrong SA.
    if suffix_array_native(np.zeros(4, dtype=np.uint8)) is None:
        pytest.skip("native SA-IS library unavailable")
    with pytest.raises(RuntimeError, match="code -3"):
        suffix_array_native(np.array([255, 1, 255, 0], np.uint8))


@pytest.mark.parametrize("n", [0, 1, 2, 3, 10, 100, 1000, 4097])
def test_device_matches_doubling(rng, n):
    # Prefix doubling ON the device (CPU backend in tests; same program on
    # TPU) must be bit-identical to the host paths.
    from tpufm.index.sa_device import suffix_array_device

    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    np.testing.assert_array_equal(
        suffix_array_device(codes), suffix_array_doubling(codes)
    )


def test_device_repetitive_text():
    # Worst case for doubling: heavy repeats force the full log rounds.
    from tpufm.index.sa_device import suffix_array_device

    for pat in [b"\x00", b"\x00\x01", b"\x03\x03\x00", b"\x00\x01\x02\x03"]:
        codes = np.frombuffer(pat * 700, dtype=np.uint8).copy()
        np.testing.assert_array_equal(
            suffix_array_device(codes), suffix_array_doubling(codes)
        )


def test_device_rejects_wide_alphabet(rng):
    # the initial rank packs symbol+1 into 3 bits; larger symbols must be
    # rejected loudly, not silently missorted
    from tpufm.index.sa_device import suffix_array_device

    codes = rng.integers(0, 200, size=100, dtype=np.uint8)
    codes[0] = 100
    with pytest.raises(ValueError, match=r"\[0, 6\]"):
        suffix_array_device(codes)

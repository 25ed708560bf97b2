"""Binary BLOW5 container: StreamVByte/zigzag-delta codec units, full-file
round-trips across compression combinations, and pA-stream parity with the
ASCII SLOW5 path (the reference decodes both through slow5lib and converts
identically, rsig.c:496-503)."""

import numpy as np
import pytest

from rawhash_tpu.io import blow5 as b5
from rawhash_tpu.io import sigfile


def test_svb_roundtrip_random():
    rng = np.random.default_rng(0)
    for n in (0, 1, 3, 4, 5, 1000):
        vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
        assert np.array_equal(b5.svb_decode(b5.svb_encode(vals), n), vals)


def test_svb_byte_lengths_exercised():
    vals = np.array([0, 1, 0xFF, 0x100, 0xFFFF, 0x10000, 0xFFFFFF, 0x1000000,
                     0xFFFFFFFF], dtype=np.uint32)
    enc = b5.svb_encode(vals)
    # 3 ctrl bytes + sum of per-value byte lengths
    assert len(enc) == 3 + (1 + 1 + 1 + 2 + 2 + 3 + 3 + 4 + 4)
    assert np.array_equal(b5.svb_decode(enc, len(vals)), vals)


def test_svb_zd_signal_roundtrip():
    rng = np.random.default_rng(1)
    sig = rng.integers(-500, 2000, size=4321).astype(np.int16)
    out = b5.svb_zd_decode_signal(b5.svb_zd_encode_signal(sig))
    assert out.dtype == np.int16
    assert np.array_equal(out, sig)
    # int16 wraparound deltas survive the int32 zigzag
    sig2 = np.array([-32768, 32767, -32768, 0, 5], dtype=np.int16)
    assert np.array_equal(
        b5.svb_zd_decode_signal(b5.svb_zd_encode_signal(sig2)), sig2
    )


@pytest.mark.parametrize("record_press", [b5.PRESS_NONE, b5.PRESS_ZLIB,
                                          b5.PRESS_ZSTD])
@pytest.mark.parametrize("signal_press", [b5.SIGPRESS_NONE, b5.SIGPRESS_SVB_ZD])
def test_blow5_file_roundtrip(tmp_path, record_press, signal_press):
    if record_press == b5.PRESS_ZSTD:
        pytest.importorskip("zstandard")
    rng = np.random.default_rng(2)
    reads = [
        (f"read_{i}", (rng.uniform(40.0, 160.0, size=200 + 37 * i))
         .astype(np.float32))
        for i in range(5)
    ]
    path = str(tmp_path / "t.blow5")
    b5.write_blow5(path, reads, record_press=record_press,
                   signal_press=signal_press)
    got = list(b5.read_blow5_raw(path))
    assert [g["read_id"] for g in got] == [n for n, _ in reads]
    for g, (_n, pa) in zip(got, reads):
        assert g["digitisation"] == 10000.0 and g["range"] == 100.0
        assert g["sampling_rate"] == 4000.0
        # DAC quantization at 0.01 pA
        back = g["signal"].astype(np.float64) / 100.0
        np.testing.assert_allclose(back, pa.astype(np.float64), atol=0.0051)


def test_blow5_matches_slow5_pa_stream(tmp_path):
    """Both containers written from the same pA reads must reconstruct the
    identical filtered float32 pA stream through read_signals()."""
    rng = np.random.default_rng(3)
    reads = [("a", rng.uniform(20.0, 210.0, size=3000).astype(np.float32)),
             ("b", rng.uniform(40.0, 160.0, size=1234).astype(np.float32))]
    sp = str(tmp_path / "x.slow5")
    bp = str(tmp_path / "x.blow5")
    sigfile.write_slow5(sp, reads)
    b5.write_blow5(bp, reads)
    got_s = list(sigfile.read_signals(sp))
    got_b = list(sigfile.read_signals(bp))
    assert [n for n, _ in got_s] == [n for n, _ in got_b] == ["a", "b"]
    for (_, ss), (_, sb) in zip(got_s, got_b):
        assert ss.dtype == sb.dtype == np.float32
        assert np.array_equal(ss, sb)
    # the (30,200) pA drop filter fired on read "a"
    assert got_b[0][1].shape[0] < 3000


def test_blow5_discovery_and_dispatch(tmp_path):
    reads = [("r0", np.full(100, 80.0, dtype=np.float32))]
    p = str(tmp_path / "d" / "y.blow5")
    import os

    os.makedirs(os.path.dirname(p))
    b5.write_blow5(p, reads)
    found = sigfile.find_signal_files(str(tmp_path))
    assert found == [p]
    (name, sig), = list(sigfile.stream_signal_dir(str(tmp_path)))
    assert name == "r0" and sig.shape[0] == 100


def test_blow5_bad_magic(tmp_path):
    p = str(tmp_path / "bad.blow5")
    with open(p, "wb") as fp:
        fp.write(b"NOTBLOW5" + b"\0" * 100)
    with pytest.raises(ValueError, match="magic"):
        list(b5.read_blow5_raw(p))

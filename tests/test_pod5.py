"""Native POD5 container: svb16/VBZ codec units (vs a scalar oracle),
full-file round-trips (compressed + raw, chunked signal rows), FlatBuffer
footer parse, and pA-stream parity with the SLOW5 path given the same
calibration (the reference converts identically through lib_pod5,
rsig.c:416-431)."""

import uuid

import numpy as np
import pytest

from rawhash_tpu.io import pod5_native as p5
from rawhash_tpu.io import sigfile


def _svb16_encode_oracle(vals):
    """Scalar svb16: 1 key bit per value (LSB-first), 1-2 LE data bytes."""
    keys = bytearray((len(vals) + 7) // 8)
    data = bytearray()
    for i, v in enumerate(vals):
        v = int(v)
        if v > 0xFF:
            keys[i // 8] |= 1 << (i % 8)
            data += bytes((v & 0xFF, v >> 8))
        else:
            data.append(v)
    return bytes(keys) + bytes(data)


def test_svb16_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 9, 1000):
        vals = rng.integers(0, 2**16, size=n, dtype=np.uint16)
        enc = p5.svb16_encode(vals)
        assert enc == _svb16_encode_oracle(vals)
        assert np.array_equal(p5.svb16_decode(enc, n), vals)


def test_svb16_key_section_size():
    vals = np.array([0, 255, 256, 65535, 1, 300, 2, 40000, 5], dtype=np.uint16)
    enc = p5.svb16_encode(vals)
    assert len(enc) == 2 + (1 + 1 + 2 + 2 + 1 + 2 + 1 + 2 + 1)
    assert np.array_equal(p5.svb16_decode(enc, len(vals)), vals)


def test_vbz_signal_roundtrip():
    rng = np.random.default_rng(1)
    sig = rng.integers(-500, 2000, size=4321).astype(np.int16)
    assert np.array_equal(p5.vbz_decode_signal(p5.vbz_encode_signal(sig), len(sig)), sig)
    # int16 wrap-around deltas survive
    sig2 = np.array([-32768, 32767, -32768, 0, 5], dtype=np.int16)
    assert np.array_equal(p5.vbz_decode_signal(p5.vbz_encode_signal(sig2), 5), sig2)
    # empty
    assert p5.vbz_decode_signal(p5.vbz_encode_signal(np.zeros(0, np.int16)), 0).shape == (0,)


def _mk_reads(n=5, rng=None):
    rng = rng or np.random.default_rng(2)
    reads = []
    for i in range(n):
        ln = int(rng.integers(50, 5000))
        raw = rng.integers(200, 900, size=ln).astype(np.int16)
        reads.append((str(uuid.uuid5(uuid.NAMESPACE_OID, f"r{i}")), raw))
    return reads


@pytest.mark.parametrize("compress", [True, False])
def test_pod5_file_roundtrip(tmp_path, compress):
    reads = _mk_reads()
    path = str(tmp_path / "t.pod5")
    p5.write_pod5(path, reads, calibration_offset=3.0, calibration_scale=0.25,
                  compress=compress, chunk=1024)  # chunk < read len: multi-row
    recs = list(p5.read_pod5_raw(path))
    assert [r["read_id"] for r in recs] == [n for n, _ in reads]
    for rec, (_n, raw) in zip(recs, reads):
        assert np.array_equal(rec["signal"], raw)
        assert rec["calibration_offset"] == 3.0
        assert rec["calibration_scale"] == 0.25


def test_pod5_footer_parse(tmp_path):
    reads = _mk_reads(n=2)
    path = str(tmp_path / "t.pod5")
    p5.write_pod5(path, reads)
    data = open(path, "rb").read()
    import struct

    flen = struct.unpack_from("<q", data, len(data) - 32)[0]
    footer = data[len(data) - 32 - flen: len(data) - 32]
    contents = p5.parse_footer(footer)
    assert len(contents) == 2
    ctypes = {c[3] for c in contents}
    assert ctypes == {p5.CONTENT_READS_TABLE, p5.CONTENT_SIGNAL_TABLE}
    for offset, length, fmt, _ct in contents:
        assert fmt == p5.FORMAT_FEATHER_V2
        assert data[offset: offset + 8] == b"ARROW1\x00\x00"
        assert data[offset + length - 6: offset + length] == b"ARROW1"


def test_pod5_marker_split_fallback(tmp_path, monkeypatch):
    reads = _mk_reads(n=3)
    path = str(tmp_path / "t.pod5")
    p5.write_pod5(path, reads)
    monkeypatch.setattr(p5, "parse_footer", lambda buf: (_ for _ in ()).throw(ValueError()))
    recs = list(p5.read_pod5_raw(path))
    assert len(recs) == 3
    assert np.array_equal(recs[0]["signal"], reads[0][1])


def test_pod5_pa_stream_matches_slow5(tmp_path):
    """Same raw DACs through POD5 and SLOW5 writers -> identical pA streams
    (the reference computes pa=(raw+offset)*range/digitisation for both;
    POD5's calibration_scale IS range/digitisation)."""
    rng = np.random.default_rng(3)
    dig, rng_pa, off = 8192.0, 1437.9, 10.0
    reads = _mk_reads(n=4, rng=rng)
    pod_path = str(tmp_path / "t.pod5")
    p5.write_pod5(pod_path, reads,
                  calibration_offset=off,
                  calibration_scale=np.float32(np.float32(rng_pa) / np.float32(dig)))
    slow_path = str(tmp_path / "t.slow5")
    with open(slow_path, "w") as fp:
        fp.write("#slow5_version\t2.0\n#num_read_groups\t1\n@asic_id\t0\n")
        fp.write("#char*\tuint32_t\tdouble\tdouble\tdouble\tdouble\tuint64_t\tint16_t*\n")
        fp.write("#read_id\tread_group\tdigitisation\toffset\trange"
                 "\tsampling_rate\tlen_raw_signal\traw_signal\n")
        for name, raw in reads:
            fp.write(f"{name}\t0\t{dig:g}\t{off:g}\t{rng_pa:g}\t4000\t{len(raw)}\t"
                     + ",".join(map(str, raw.tolist())) + "\n")
    pod = dict(sigfile.read_pod5(pod_path))
    slw = dict(sigfile.read_slow5(slow_path))
    assert set(pod) == set(slw)
    for name in pod:
        assert np.array_equal(pod[name], slw[name]), name


def test_pod5_via_dispatch_and_discovery(tmp_path):
    reads = _mk_reads(n=2)
    path = str(tmp_path / "sub" / "x.pod5")
    (tmp_path / "sub").mkdir()
    p5.write_pod5(path, reads, calibration_offset=0.0, calibration_scale=0.05)
    files = sigfile.find_signal_files(str(tmp_path))
    assert files == [path]
    got = list(sigfile.read_signals(path))
    assert [n for n, _ in got] == [n for n, _ in reads]
    for (_n, pa), (_m, raw) in zip(got, reads):
        ref = raw.astype(np.float32) * np.float32(0.05)
        assert np.array_equal(pa, ref[(ref > 30) & (ref < 200)])

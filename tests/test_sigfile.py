"""Signal-container IO tests (FAST5 via h5py, SLOW5 ASCII, npz, discovery)."""

import numpy as np
import pytest

from rawhash_tpu.io.sigfile import (
    find_signal_files,
    read_fast5,
    read_sig_npz,
    read_signals,
    read_slow5,
    write_sig_npz,
)

h5py = pytest.importorskip("h5py")


def make_multiread_fast5(path, reads):
    """Standard multi-read FAST5 layout (read_<id>/Raw/Signal + channel_id)."""
    with h5py.File(path, "w") as f:
        for rid, raw, (dig, rng, off) in reads:
            g = f.create_group(f"read_{rid}")
            g.create_group("channel_id").attrs.update(
                dict(digitisation=dig, range=rng, offset=off, channel_number="1")
            )
            graw = g.create_group("Raw")
            graw.attrs["read_id"] = rid
            graw.create_dataset("Signal", data=raw.astype(np.int16))


def test_fast5_roundtrip_and_pa_conversion(tmp_path):
    p = str(tmp_path / "x.fast5")
    rng = np.random.default_rng(0)
    # DAC values that land in the (30, 200) pA window plus outliers
    raw = rng.integers(400, 1600, size=500).astype(np.int16)
    raw[:5] = 0  # converts below 30 pA -> dropped
    raw[5:8] = 4000  # above 200 pA -> dropped
    dig, rg, off = 8192.0, 1000.0, 10.0
    make_multiread_fast5(p, [("readA", raw, (dig, rg, off))])
    out = list(read_fast5(p))
    assert len(out) == 1
    name, sig = out[0]
    assert name == "readA"
    pa = (raw.astype(np.float32) + off) * (rg / dig)
    expect = pa[(pa > 30) & (pa < 200)].astype(np.int16).astype(np.float32)
    np.testing.assert_array_equal(sig, expect)
    assert (sig > 29).all() and (sig < 200).all()


def test_slow5_ascii(tmp_path):
    p = str(tmp_path / "x.slow5")
    raw = np.array([500, 600, 700, 8000], dtype=np.int64)
    dig, off, rg = 8192.0, 10.0, 1000.0
    with open(p, "w") as fp:
        fp.write("#slow5_version 2.0\n")
        fp.write("@asic_id x\n")
        fp.write(
            "r1\t0\t{}\t{}\t{}\t4000\t{}\t{}\n".format(
                dig, off, rg, len(raw), ",".join(map(str, raw))
            )
        )
    out = list(read_slow5(p))
    assert out[0][0] == "r1"
    pa = (raw + off) * (rg / dig)
    keep = pa[(pa > 30) & (pa < 200)]
    np.testing.assert_allclose(out[0][1], keep, rtol=1e-5)


def test_npz_roundtrip(tmp_path):
    p = str(tmp_path / "reads.sig.npz")
    reads = [("a", np.arange(10, dtype=np.float32)), ("b", np.ones(5, np.float32))]
    write_sig_npz(p, reads)
    got = list(read_sig_npz(p))
    assert [g[0] for g in got] == ["a", "b"]
    np.testing.assert_array_equal(got[0][1], reads[0][1])


def test_find_signal_files_recursive(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.fast5").touch()
    (tmp_path / "sub" / "b.pod5").touch()
    (tmp_path / "sub" / "c.blow5").touch()
    (tmp_path / "noise.txt").touch()
    files = find_signal_files(str(tmp_path))
    names = [f.split("/")[-1] for f in files]
    assert names == ["a.fast5", "b.pod5", "c.blow5"]


def test_read_signals_dispatch(tmp_path):
    p = str(tmp_path / "r.sig.npz")
    write_sig_npz(p, [("x", np.ones(3, np.float32))])
    assert list(read_signals(p))[0][0] == "x"

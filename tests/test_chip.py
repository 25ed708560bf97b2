"""Real-TPU bit-parity tests (opt-in: RAWHASH_TPU_CHIP_TESTS=1).

The suite conftest pins the whole process to the CPU backend, so each chip
check runs in a fresh subprocess that keeps the default (TPU) platform.
Small shapes — each subprocess is seconds of device time (first run pays
the jit compile; the persistent cache makes reruns fast).

What must hold on the chip, not just in interpret mode:
  * Pallas chain fill == lax.scan oracle (reference: mg_lchain_dp,
    lchain.c:385-530)
  * Pallas SMEM backtrack == host backtrack (lchain.c:95-194)
  * device-tail engine records == host-tail engine records (rmap.cpp:389-599)
  * the fused chunk step's event/sketch outputs == CPU values
    (revent.c:257, rsketch.c:271)

Run:  RAWHASH_TPU_CHIP_TESTS=1 python -m pytest tests/test_chip.py -v
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RAWHASH_TPU_CHIP_TESTS"),
    reason="chip tests are opt-in: set RAWHASH_TPU_CHIP_TESTS=1",
)

REPO = Path(__file__).resolve().parent.parent


def _run_on_chip(code: str, timeout: int = 600) -> str:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # keep the default (TPU) platform
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(REPO), env=env, capture_output=True, text=True,
        timeout=timeout,
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    return out.stdout


PREAMBLE = """
import jax, numpy as np, jax.numpy as jnp
assert jax.default_backend() != "cpu", (
    "chip test fell back to CPU: backend=" + jax.default_backend())
"""


def test_pallas_fill_on_chip():
    out = _run_on_chip(PREAMBLE + """
from rawhash_tpu.chain.device import chain_fill_batch
from rawhash_tpu.chain.pallas_fill import chain_fill_pallas
rng = np.random.default_rng(3)
b, n = 8, 512
key = np.sort(rng.integers(0, 2, (b, n)).astype(np.uint32) << 31, axis=1)
tpos = np.sort(rng.integers(0, 5000, (b, n)), axis=1).astype(np.int32)
qpos = rng.integers(0, 700, (b, n)).astype(np.int32)
n_anchors = rng.integers(n // 4, n + 1, b).astype(np.int32)
args = dict(q_span=13, max_dist_t=2500, max_dist_q=2500, bw=500,
            max_iter=64, chn_pen_gap=0.1352, chn_pen_skip=0.0)
f0, p0 = chain_fill_batch(jnp.asarray(key), jnp.asarray(tpos),
                          jnp.asarray(qpos), jnp.asarray(n_anchors), **args)
f1, p1 = chain_fill_pallas(jnp.asarray(key), jnp.asarray(tpos),
                           jnp.asarray(qpos), jnp.asarray(n_anchors), **args)
np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
print("PALLAS_FILL_OK", jax.default_backend())
""")
    assert "PALLAS_FILL_OK" in out


def test_pallas_backtrack_on_chip():
    """backtrack_pallas on the chip == XLA backtrack_batch == host backtrack
    (reference: mg_chain_backtrack, lchain.c:95-194)."""
    out = _run_on_chip(PREAMBLE + """
from rawhash_tpu.chain.device import chain_fill_batch
from rawhash_tpu.chain.backtrack_device import backtrack_batch
from rawhash_tpu.chain.backtrack_pallas import backtrack_pallas
from rawhash_tpu.chain.host import chain_backtrack
rng = np.random.default_rng(11)
b, n = 4, 384
# clustered anchors so real chains form
tpos = np.sort(rng.integers(0, 800, (b, n)), axis=1).astype(np.int32)
qpos = (tpos // 2 + rng.integers(-20, 20, (b, n))).clip(0).astype(np.int32)
key = np.zeros((b, n), np.uint32)
n_anchors = np.full(b, n, np.int32)
args = dict(q_span=13, max_dist_t=2500, max_dist_q=2500, bw=500,
            max_iter=64, chn_pen_gap=0.1352, chn_pen_skip=0.0)
f, p = chain_fill_batch(jnp.asarray(key), jnp.asarray(tpos),
                        jnp.asarray(qpos), jnp.asarray(n_anchors), **args)
bt = dict(min_cnt=2, min_sc=10, max_drop=500, k_cap=32)
na = jnp.asarray(n_anchors)
out_pl = backtrack_pallas(f, p, na, **bt)
out_xla = backtrack_batch(f, p, na, **bt)
for a, b_ in zip(out_pl, out_xla):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
u_sc, u_cnt, n_u, v, n_v, ovf = out_pl
hf, hp = np.asarray(f), np.asarray(p)
for i in range(b):
    hu, hv = chain_backtrack(hf[i].astype(np.int32), hp[i].astype(np.int64),
                             min_cnt=2, min_sc=10, max_drop=500)
    k = int(n_u[i])
    np.testing.assert_array_equal(np.asarray(u_sc[i])[:k], hu[:k, 0])
    np.testing.assert_array_equal(np.asarray(u_cnt[i])[:k], hu[:k, 1])
    np.testing.assert_array_equal(np.asarray(v[i])[: int(n_v[i])], hv)
print("PALLAS_BT_OK")
""")
    assert "PALLAS_BT_OK" in out


def test_device_tail_engine_on_chip():
    out = _run_on_chip(PREAMBLE + """
import os
from rawhash_tpu.config import IndexOptions, MapOptions
from rawhash_tpu.index.build import build_index_from_sequences
from rawhash_tpu.io.signal_gen import simulate_reads
from rawhash_tpu.map.engine import MappingEngine
from rawhash_tpu.pore import synthetic_pore
rng = np.random.default_rng(40)
pore = synthetic_pore(k=6)
genome = "".join(rng.choice(list("ACGT"), size=8000))
index = build_index_from_sequences([("chr1", genome)], pore, IndexOptions())
reads = simulate_reads(genome, pore, n_reads=6, read_len=1500, rng=rng)
batch = [(n, s) for n, s, _, _ in reads]
def key(res):
    return [(r.name, [(m.mapped, m.ref_id, m.read_start, m.read_end,
                       m.frag_start, m.frag_len, m.rev, m.mapq)
                      for m in r.records]) for r in res]
def mo():
    m = MapOptions()
    m.chunk_size = 1000
    m.max_num_chunk = 6
    return m
os.environ["RAWHASH_TPU_DEVICE_TAIL"] = "1"
eng = MappingEngine(index, mo())
assert eng.device_tail
dev = eng.map_batch(batch)
del os.environ["RAWHASH_TPU_DEVICE_TAIL"]
eng2 = MappingEngine(index, mo())
assert not eng2.device_tail
host = eng2.map_batch(batch)
assert key(dev) == key(host), (key(dev), key(host))
assert any(m.mapped for r in dev for m in r.records)
print("DEVICE_TAIL_OK")
""")
    assert "DEVICE_TAIL_OK" in out


def test_chunk_step_events_sketch_on_chip():
    """The fused chunk step's per-chunk scalars and anchors on the chip must
    equal the CPU-backend values on the same inputs (float event pipeline is
    float32 both ways; mismatch = chip numerics diverging)."""
    code_body = """
import json
from rawhash_tpu.config import IndexOptions, MapOptions
from rawhash_tpu.index.build import build_index_from_sequences
from rawhash_tpu.io.signal_gen import simulate_reads
from rawhash_tpu.map.engine import MappingEngine
from rawhash_tpu.pore import synthetic_pore
rng = np.random.default_rng(5)
pore = synthetic_pore(k=6)
genome = "".join(rng.choice(list("ACGT"), size=6000))
index = build_index_from_sequences([("chr1", genome)], pore, IndexOptions())
reads = simulate_reads(genome, pore, n_reads=4, read_len=1200, rng=rng)
eng = MappingEngine(index, MapOptions())
res = eng.map_batch([(n, s) for n, s, _, _ in reads])
print("RECORDS", json.dumps([
    (r.name, [(m.mapped, m.ref_id, m.read_start, m.read_end,
               m.frag_start, m.frag_len, m.rev, m.mapq)
              for m in r.records]) for r in res]))
"""
    chip = _run_on_chip(PREAMBLE + code_body)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cpu = subprocess.run(
        [sys.executable, "-c", "import numpy as np\n" + code_body],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=600,
    )
    assert cpu.returncode == 0, cpu.stderr
    chip_rec = [l for l in chip.splitlines() if l.startswith("RECORDS")]
    cpu_rec = [l for l in cpu.stdout.splitlines() if l.startswith("RECORDS")]
    assert chip_rec == cpu_rec, f"chip: {chip_rec}\ncpu: {cpu_rec}"

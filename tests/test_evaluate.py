"""Accuracy evaluator: tp/fp/fn/tn classification, P/R/F1, throughput stats
(reference methodology: test/scripts/pafstats.py:12-99, compare_pafs.py:17-62).
"""

import json
import subprocess
import sys
from pathlib import Path

from rawhash_tpu.evaluate import (
    annotate_paf,
    evaluate_paf,
    location_overlap,
    parse_paf,
)

TOOL = [
    # read1 correctly mapped to chr1 (truth agrees) -> tp
    "read1\t1000\t0\t900\t+\tchr1\t30000\t100\t1000\t50\t900\t60\t"
    "mt:f:2.5\tci:i:1\tsl:i:4000",
    # read2 mapped to chr2 but truth says chr1 -> fp (+ fn for truth pair)
    "read2\t800\t0\t700\t-\tchr2\t20000\t5000\t5700\t40\t700\t30\t"
    "mt:f:4.0\tci:i:2\tsl:i:8000",
    # read3 unmapped, truth also unmapped -> tn
    "read3\t500\t*\t*\t*\t*\t*\t*\t*\t*\t*\t0\tmt:f:10.0\tsl:i:20000",
    # read4 unmapped but truth maps it -> fn
    "read4\t600\t*\t*\t*\t*\t*\t*\t*\t*\t*\t0\tmt:f:8.0\tsl:i:16000",
]
TRUTH = [
    "read1\t1000\t0\t950\t+\tchr1\t30000\t120\t1050\t900\t950\t60",
    "read2\t800\t0\t750\t-\tchr1\t30000\t9000\t9700\t700\t750\t60",
    "read4\t600\t0\t550\t+\tchr1\t30000\t200\t800\t500\t550\t60",
]


def test_classification_counts():
    res = evaluate_paf(TOOL, TRUTH)
    # pairs: (r1,chr1) tp; (r2,chr2) fp; (r2,chr1) fn; (r3,*) tn; (r4,*)+
    # (r4,chr1) -> fn for the truth pair, tn for the unmapped pair
    assert (res.tp, res.fp, res.fn, res.tn) == (1, 1, 2, 2)
    assert res.precision == 0.5
    assert res.recall == 1 / 3
    assert abs(res.f1 - 2 * 0.5 * (1 / 3) / (0.5 + 1 / 3)) < 1e-12


def test_throughput_stats():
    res = evaluate_paf(TOOL, TRUTH)
    # per-read bp/s: 1000*1000/2.5=400000, 1000*800/4=200000,
    # 1000*500/10=50000, 1000*600/8=75000
    assert abs(res.mean_bps - (400000 + 200000 + 50000 + 75000) / 4) < 1e-6
    assert abs(res.median_mt_ms - 6.0) < 1e-12  # median of 2.5,4,8,10
    # signals/s: 4000/2.5*1000 etc.
    assert abs(res.mean_sps - (1600000 + 2000000 + 2000000 + 2000000) / 4) < 1e-6


def test_first_record_only():
    """Secondary records of the same read don't double-count timing
    (pafstats.py:46-53 counts the first record per read)."""
    tool = TOOL + [
        "read1\t1000\t0\t900\t+\tchr1\t30000\t700\t1600\t50\t900\t0\tmt:f:99.0"
    ]
    res = evaluate_paf(tool, TRUTH)
    assert abs(res.median_mt_ms - 6.0) < 1e-12


def test_annotate():
    lines = list(annotate_paf(TOOL, TRUTH))
    assert lines[0].endswith("rf:Z:tp")
    assert lines[1].endswith("rf:Z:fp")
    assert lines[2].endswith("rf:Z:tn")
    assert lines[3].endswith("rf:Z:tn")  # the (read4,*) pair itself is tn


def test_location_overlap():
    d = location_overlap(TOOL, TRUTH, slop=0)
    assert d["mapped"] == 2
    assert d["location_correct"] == 1  # read1 overlaps truth; read2 wrong tgt
    assert d["location_accuracy"] == 0.5


def test_parse_paf_tags():
    reads = parse_paf(TOOL)
    assert reads[0].mt_ms == 2.5 and reads[0].sl == 4000
    assert reads[2].target == "*" and reads[2].qlen == 500


def test_cli_json(tmp_path: Path):
    tp = tmp_path / "tool.paf"
    tr = tmp_path / "truth.paf"
    tp.write_text("\n".join(TOOL) + "\n")
    tr.write_text("\n".join(TRUTH) + "\n")
    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, str(repo / "tools" / "pafstats.py"), str(tp), str(tr)],
        capture_output=True, text=True, check=True,
    )
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert d["tp"] == 1 and d["fp"] == 1 and d["fn"] == 2 and d["tn"] == 2
    assert "Precision: 0.5000" in out.stderr
    # annotate mode round-trips
    out2 = subprocess.run(
        [sys.executable, str(repo / "tools" / "pafstats.py"), str(tp), str(tr),
         "--annotate"],
        capture_output=True, text=True, check=True,
    )
    assert out2.stdout.splitlines()[0].endswith("rf:Z:tp")

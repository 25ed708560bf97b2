"""Real-dataset evaluation runner (staged; runs wherever downloads work).

This environment is zero-egress, so no D1-D7 dataset can be fetched here;
this runner stages the full harness so the evaluation is one command on any
host with network access:

    # 1. fetch a dataset with the reference's own script (URLs in
    #    tools/datasets/manifest.json mirror test/data/download_*.sh):
    bash /path/to/reference/test/data/download_d2_ecoli_r94.sh
    # 2. produce the ground truth with minimap2 on the basecalls
    #    (the reference's evaluation does exactly this,
    #    test/evaluation/read_mapping/*/1_generate_results.sh):
    minimap2 -x map-ont -t 32 --secondary=no ref.fa reads.fasta > true.paf
    # 3. map + evaluate + gate:
    python tools/datasets/run_eval.py d2_ecoli_r94 \
        --data-dir d2_ecoli_r94 --truth true.paf

Maps the dataset's signal files with the manifest's preset/pore model,
evaluates precision/recall against the truth PAF with the repo evaluator
(rawhash_tpu/evaluate.py — same semantics as the reference's
compare_pafs.py), and exits nonzero if the manifest's accuracy gates fail.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="manifest key, e.g. d2_ecoli_r94")
    ap.add_argument("--data-dir", required=True,
                    help="dir with ref.fa + fast5_files/ (or pod5/slow5)")
    ap.add_argument("--truth", required=True,
                    help="ground-truth PAF (minimap2 on basecalls)")
    ap.add_argument("--pore", default=None,
                    help="pore model file (default: manifest path relative "
                         "to the reference checkout)")
    ap.add_argument("--reference-checkout", default="/root/reference")
    ap.add_argument("--out", default=None, help="PAF output (default: tmp)")
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    args = ap.parse_args()

    man = json.load(open(os.path.join(HERE, "manifest.json")))["datasets"]
    if args.dataset not in man:
        raise SystemExit(f"unknown dataset {args.dataset}; "
                         f"known: {sorted(man)}")
    d = man[args.dataset]
    pore = args.pore or os.path.join(args.reference_checkout, d["pore"])
    if not os.path.exists(pore):
        raise SystemExit(f"pore model not found: {pore}")
    ref_fa = os.path.join(args.data_dir, "ref.fa")
    sig_dir = None
    for cand in ("fast5_files", "pod5_files", "slow5_files", "."):
        p = os.path.join(args.data_dir, cand)
        if os.path.isdir(p):
            sig_dir = p
            break
    out_paf = args.out or os.path.join(args.data_dir, "rawhash_tpu.paf")

    cmd = [
        sys.executable, "-m", "rawhash_tpu", "-x", d["preset"],
        *d.get("extra_flags", []),
        "-t", str(args.threads), "-p", pore,
        "-o", out_paf, ref_fa, sig_dir,
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    t0 = time.time()
    r = subprocess.run(cmd, env=dict(os.environ, PYTHONPATH=REPO))
    if r.returncode != 0:
        raise SystemExit(f"mapping failed rc={r.returncode}")
    wall = time.time() - t0

    sys.path.insert(0, REPO)
    from rawhash_tpu.evaluate import evaluate_paf

    res = evaluate_paf(out_paf, args.truth).as_dict()
    res["dataset"] = args.dataset
    res["mapping_wall_s"] = round(wall, 1)
    if "baseline_bps_32t" in d:
        res["baseline_bps_32t"] = d["baseline_bps_32t"]
    gates = d.get("gates", {})
    ok = (
        res.get("precision", 0) >= gates.get("min_precision", 0)
        and res.get("recall", 0) >= gates.get("min_recall", 0)
    )
    res["gates"] = gates
    res["gates_passed"] = ok
    print(json.dumps(res))
    raise SystemExit(0 if ok else 2)


if __name__ == "__main__":
    main()

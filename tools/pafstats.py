#!/usr/bin/env python
"""Precision/recall/F1 of a mapping PAF vs a ground-truth PAF.

Equivalent of the reference's test/scripts/pafstats.py (and the
tp/fp/fn/tn + timing portion of compare_pafs.py): classify (read, target)
pairs against the truth, report accuracy and per-read throughput from the
mt:f:/sl:i: PAF tags.

    python tools/pafstats.py tool.paf truth.paf            # one JSON line
    python tools/pafstats.py tool.paf truth.paf --annotate # rf:Z: tags
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rawhash_tpu.evaluate import annotate_paf, evaluate_paf  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_paf", help="tool output PAF (with mt:f: tags)")
    ap.add_argument("truth_paf", help="ground-truth PAF (e.g. minimap2)")
    ap.add_argument(
        "--annotate", action="store_true",
        help="print each input line with an rf:Z:{tp,fp,fn,tn} tag "
        "(the `uncalled pafstats --annotate` flow)",
    )
    args = ap.parse_args()
    if args.annotate:
        for line in annotate_paf(args.input_paf, args.truth_paf):
            print(line)
        return
    res = evaluate_paf(args.input_paf, args.truth_paf)
    d = res.as_dict()
    print(
        f"TP: {d['tp']}  FP: {d['fp']}  FN: {d['fn']}  TN: {d['tn']}\n"
        f"Precision: {d['precision']:.4f}  Recall: {d['recall']:.4f}  "
        f"F1: {d['f1']:.4f}\n"
        f"Speed            Mean    Median\n"
        f"BP per sec: {d['mean_bps']:9.2f} {d['median_bps']:9.2f}\n"
        f"Signals per sec: {d['mean_sps']:9.2f} {d['median_sps']:9.2f}\n"
        f"MS to map:  {d['mean_mt_ms']:9.2f} {d['median_mt_ms']:9.2f}",
        file=sys.stderr,
    )
    print(json.dumps(d))


if __name__ == "__main__":
    main()

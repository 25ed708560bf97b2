"""Regenerate README.md's measured-performance block from the committed
bench artifact (round-3 VERDICT item 8: one source of perf truth — every
README performance claim must quote a committed BENCH_r*.json, not the best
run ever seen).

Usage:
    python tools/gen_readme_perf.py [BENCH_rNN.json]   # default: newest

Rewrites the section between <!-- PERF:BEGIN --> and <!-- PERF:END --> in
README.md.  Everything inside the markers is machine-written; edit the
surroundings, not the block.
"""

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_bench() -> str:
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not paths:
        raise SystemExit("no BENCH_r*.json artifact found")
    return paths[-1]


def render(bench_path: str) -> str:
    # artifacts may carry a second compact headline line (bench.py emits
    # the full dict first, then a tail-capture-proof summary line)
    art = json.loads(open(bench_path).readline())
    b = art.get("parsed", art)  # driver artifact wraps the JSON line
    name = os.path.basename(bench_path)
    lines = [
        f"Measured numbers below are quoted verbatim from `{name}`",
        "(a committed bench artifact); run `python bench.py` to reproduce.",
        "Wall-clock numbers on this shared",
        "2-core/tunneled-device host breathe ~2x with unrelated load — the",
        "same-host reference head-to-head (both sides best-of-N in the same",
        "process) is the noise-controlled comparison.",
        "",
        "| Workload | bp/s | vs 32-thread CPU baseline | vs reference on this host | accuracy |",
        "|---|---|---|---|---|",
    ]

    def row(label, d, baseline_note):
        bps = d.get("bps", d.get("value"))
        vsb = d.get("vs_baseline")
        vsr = d.get("vs_reference_same_host")
        acc = d.get("accuracy")
        lines.append(
            f"| {label} | {bps:,.0f} | {vsb:.2f}x ({baseline_note}) | "
            + (f"{vsr:.2f}x" if vsr is not None else "—")
            + " | "
            + (f"{acc:.3f}" if acc is not None else "—")
            + " |"
        )

    row("viral (D1-style 30 kb, `viral`)", b, "625,160 bp/s")
    if "ecoli_5mbp" in b:
        row("ecoli (D2-style 5 Mbp, `sensitive`)", b["ecoli_5mbp"], "65,996 bp/s")
    if "gbp3_human" in b:
        row("full human-scale (3 Gbp, 24 chrs, `fast -w 5`)", b["gbp3_human"],
            "1,837 bp/s")
    if "gbp1_human_scale" in b:
        row("human-scale (1 Gbp, `fast -w 3`)", b["gbp1_human_scale"],
            "1,837 bp/s")
    if "d4_100mbp" in b:
        row("D4-scale (100 Mbp, `sensitive`)", b["d4_100mbp"], "8,390 bp/s")
    lines.append("")
    if "ava_overlap" in b:
        a = b["ava_overlap"]
        ref = ""
        if "reference_precision" in a:
            ref = (f" (reference binary on the identical workload: "
                   f"P={a['reference_precision']}/R={a['reference_recall']})")
        lines.append(
            f"Rawsamble all-vs-all overlap quality: P={a['precision']}/"
            f"R={a['recall']}{ref}."
        )
        lines.append("")
    wd = b.get("warmup_detail", {})
    if wd:
        lines.append(
            f"Warmup (compile + first batch) measured {b.get('warmup_s')}s on "
            f"the viral workload — {wd.get('program_build_s')}s of that is "
            f"program builds ({wd.get('n_programs_built')} programs; "
            f"{wd.get('n_cache_files_written')} persistent-cache writes, so "
            "0 writes = pure cache loads).  The CLI overlaps warmup with "
            "file decode (`warmup_async`)."
        )
    else:
        lines.append(
            f"Warmup (compile + first batch): {b.get('warmup_s')}s on the "
            "viral workload."
        )
    lines.append("")
    cu = b.get("cell_updates_per_s")
    if cu:
        lines.append(
            f"End-to-end chaining throughput: {cu/1e6:,.0f} M "
            "cell-updates/s on the viral workload (standalone Pallas fill: "
            "5-15 G/s on-chip; `tools/profiling/fill_roofline.py`)."
        )
    return "\n".join(lines)


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else newest_bench()
    readme = os.path.join(REPO, "README.md")
    text = open(readme).read()
    begin, end = "<!-- PERF:BEGIN -->", "<!-- PERF:END -->"
    if begin not in text or end not in text:
        raise SystemExit("README.md is missing the PERF markers")
    head, rest = text.split(begin, 1)
    _, tail = rest.split(end, 1)
    block = f"{begin}\n{render(bench_path)}\n{end}"
    open(readme, "w").write(head + block + tail)
    print(f"README.md perf block regenerated from {os.path.basename(bench_path)}")


if __name__ == "__main__":
    main()

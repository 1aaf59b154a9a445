#!/usr/bin/env python3
"""Generate OPTIMIZATION_r17_APPENDIX.md — per-entry checklist merging the
r16 appendix statuses with this round's touch map and a fresh sf0.1 sweep.

Usage: python3 scripts/gen_opt_appendix_r17.py /tmp/r17_timeall.log
"""
import re
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sweep_log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r17_timeall.log"

# fresh sweep (count window, contended box — triage only)
sweep = {}
for line in open(sweep_log, encoding="utf-8", errors="replace"):
    m = re.match(r"^(\S+)\s+([0-9.]+)s\s+(-?\d+)\s+rows$", line.strip())
    if m:
        sweep[m.group(1)] = (float(m.group(2)), int(m.group(3)))

# r16 appendix: carry status/note for untouched entries
carried = {}
for line in open(os.path.join(REPO, "OPTIMIZATION_r16_APPENDIX.md"), encoding="utf-8"):
    cells = [c.strip() for c in line.strip().strip("|").split("|")]
    if len(cells) == 5 and cells[0] not in ("entry", "---"):
        carried[cells[0]] = (cells[3], cells[4])

# r17 touch map: entry (or prefix group) -> note. Only entries whose
# EXECUTION PATH changed this round.
r17 = {}

def mark(names, note):
    for n in names:
        r17[n] = note

mark(["st_exif_meta", "st_tiff_pixels", "st_ogg_headers"],
     "r17: listing bound + metadata marker count (doc §1-2); 3.5-6.6x A/B")
mark(["st_warc_extract"], "r17: session listing bound (doc §1); 1.2x A/B")
mark(["st_decontaminate_scrub", "st_decontaminate_drop"],
     "r17: bounded eval-gram pull, one distinct materialization (doc §3)")
mark(["t_ccnet_buckets"],
     "r17: bytes-estimated broadcast bound + count fusion (doc §4, §10)")
mark(["d_dedup_clusters", "d_keep_best", "d_link_authority",
      "d_semantic_dedup", "d_training_prepare"],
     "r17: clusters() primitive union-find/id-gate/single-derivation (doc §5)")
mark(["t_quality_model", "st_quality_model"],
     "r17: GD training frame = checkpoint leaf, plan 306->66 lines (doc §6)")
mark(["s_kmeans_clusters", "s_ivf_topk", "d_embedding_neardup_ivf"],
     "r17: k-means fit input widened+checkpointed, 1.55x A/B (doc §7)")
mark(["s_ivfpq_topk"],
     "r17: k-means half of doc §7 (PQ half measured slower and reverted)")
mark(["s_pq_topk"],
     "r17: checkpoint tried, MEASURED REGRESSION, reverted (doc §15)")
mark(["d_web_pipeline", "d_web_pipeline_full", "d_web_pipeline_model",
      "d_web_pipeline_substr", "d_web_pipeline_decontam"],
     "r17: stage-count fusion + fused model arm + clusters (doc §5, §8-§11); full 1.21x A/B")
mark(["d_containment_probe"], "r17: hotB count fusion (doc §10)")
mark(["d_substring_dedup"], "r17: dupH/candPos/candIds count fusion (doc §10)")
mark(["d_decontaminate", "d_decontaminate_scrub"],
     "r17: evalGrams/evalH/candPos count fusion (doc §10)")
mark(["d_bloom_prefilter"], "r17: ref-fp count fusion (doc §10)")

# entries examined this round with a recorded leave-alone reason
measured_r17 = {
    "st_click_attribution":
        "r17 measured: 6.7 s = stream-stream interval-join micro-batch "
        "(state-store writes of both sides) — streaming semantics, left",
    "st_upsert_apply":
        "r17 measured: micro-batch + state commit floor — streaming "
        "semantics, left",
    "st_stats_moments":
        "r17: complete-mode state floor; power sums already mergeable",
}

rows = []
for name in sorted(sweep):
    sec, n = sweep[name]
    if name in r17:
        status, note = "optimized", r17[name]
    elif name in measured_r17:
        status, note = "measured", measured_r17[name]
    elif name in carried:
        status, note = carried[name]
        if status == "optimized":
            status, note = "carried", "r16 optimization carried: " + note
    else:
        status, note = "audited", "no r16/r17 change recorded"
    rows.append((name, sec, n, status, note))

out = os.path.join(REPO, "OPTIMIZATION_r17_APPENDIX.md")
with open(out, "w", encoding="utf-8") as f:
    f.write("# OPTIMIZATION r17 — per-entry checklist (generated)\n\n")
    f.write("Sweep = graft.TimeAll at sf0.1, count window, box at loadavg ~5-7 "
            "(triage context only — cold-JIT/contention inflates entries that "
            "run early or share JIT paths; e.g. d_bloom_prefilter reads 8.69 s "
            "here but 1.09 s min under the forced-window QuickBench at HEAD). "
            "Before/after evidence lives in OPTIMIZATION_r17.md and plans/r17/.\n\n")
    f.write("Status key: optimized = execution path changed this round (r17); "
            "carried = r16 optimization in effect, untouched this round; "
            "measured = examined with a recorded leave-alone reason; "
            "audited = carried audit from earlier rounds.\n\n")
    f.write("| entry | sweep s | rows | status | note |\n|---|---|---|---|---|\n")
    for name, sec, n, status, note in rows:
        f.write(f"| {name} | {sec:.2f} | {n} | {status} | {note} |\n")
    n_opt = sum(1 for r in rows if r[3] == "optimized")
    n_car = sum(1 for r in rows if r[3] == "carried")
    n_meas = sum(1 for r in rows if r[3] == "measured")
    f.write(f"\nTotals: {len(rows)} entries — {n_opt} optimized this round, "
            f"{n_car} carried r16 optimizations, {n_meas} measured-and-left, "
            f"{len(rows) - n_opt - n_car - n_meas} audited.\n")
print(f"wrote {out}: {len(rows)} entries")

"""Post-hoc results analysis: the reference Analyzer's numeric core.

Walks the per-sample result tree written by the eval pipeline
(``c={cond},idx={k}/NNNN_{method}_{transform}_{param}.json``), aggregates
p-values / L0 / PSNR, and emits the robustness summaries the reference
prints from ``notebooks/analyze.ipynb`` (``wmar/utils/analyzer.py``):

* token-match stats after T round-trips (mean / median / frac > 0.8),
* TPR@1%FPR per attack at the canonical parameter points and per category
  (Valuemetric / Geometric / Adversarial Purification / Neural Compression),
* markdown + LaTeX tables.

TPR@alpha is ``mean(pvalue < alpha)`` — exact p-values are uniform under
H0, which is precisely how the reference thresholds (``analyzer.py:378``).
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import re
from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np

# (category, canonical param) per attack — ``analyzer.py:95-112``.
SUMMARY_METRICS = {
    "gaussian-blur": ("Valuemetric", 9),
    "gaussian-noise": ("Valuemetric", 0.1),
    "jpeg": ("Valuemetric", 25),
    "brightness": ("Valuemetric", 2),
    "rotation": ("Geometric", 10),
    "flip-h": ("Geometric", 1),
    "upperleft-crop": ("Geometric", 0.75),
    "diffpure": ("Adversarial Purification", 0.1),
    "neural-compress": ("Neural Compression", "q=3"),
}


@dataclasses.dataclass
class Record:
    conditioning: str
    idx: int
    method: str
    transform: str
    param: str
    metrics: dict


_FNAME = re.compile(r"^(\d+)_(.+?)_([^_]+)_([^_]+)\.json$")


def load_records(outdir: str) -> List[Record]:
    """Walk the result tree (same layout as the reference's Analyzer)."""
    records = []
    for path in glob.glob(os.path.join(outdir, "c=*,idx=*", "*.json")):
        dirname = os.path.basename(os.path.dirname(path))
        cond = dirname.split(",")[0][2:]
        fname = os.path.basename(path)
        m = _FNAME.match(fname)
        if not m:
            continue
        idx, method, transform, param = m.groups()
        with open(path) as f:
            metrics = json.load(f)
        records.append(Record(cond, int(idx), method, transform, param, metrics))
    return records


def records_from_list(records: Sequence[dict]) -> List[Record]:
    """Adapt the in-memory record dicts returned by the eval pipeline."""
    out = []
    for r in records:
        metrics = {k: v for k, v in r.items()
                   if k not in ("conditioning", "idx", "method", "transform", "param")}
        out.append(Record(str(r["conditioning"]), r["idx"], r["method"],
                          r["transform"], str(r["param"]), metrics))
    return out


def tpr_at_fpr(pvals: np.ndarray, alpha: float = 0.01) -> float:
    pvals = np.asarray(pvals, dtype=np.float64)
    if len(pvals) == 0:
        return float("nan")
    return float((pvals < alpha).mean())


def token_match_stats(records: List[Record], roundtrip: int = 1) -> Dict[str, float]:
    """Token-match (1 - L0) distribution after ``roundtrip`` round-trips —
    the reference's ``plot_l0_hist`` numbers (mean / median / frac > 0.8)."""
    matches = [
        1.0 - r.metrics["l0"]
        for r in records
        if r.transform == "roundtrips" and str(r.param) == str(roundtrip) and "l0" in r.metrics
    ]
    if not matches:
        return {}
    arr = np.asarray(matches)
    return {
        "mean": float(arr.mean()),
        "median": float(np.median(arr)),
        "frac_above_0.8": float((arr > 0.8).mean()),
        "n": len(arr),
    }


def robustness_table(records: List[Record], alpha: float = 0.01) -> Dict[str, dict]:
    """Per-attack and per-category TPR@alpha at the canonical params."""
    by_key = defaultdict(list)
    for r in records:
        if "pvalue" in r.metrics and r.metrics["pvalue"] is not None:
            by_key[(r.transform, str(r.param))].append(r.metrics["pvalue"])

    per_attack = {}
    # No-attack = roundtrip 0.
    if ("roundtrips", "0") in by_key:
        per_attack["None"] = tpr_at_fpr(by_key[("roundtrips", "0")], alpha)
    for attack, (cat, param) in SUMMARY_METRICS.items():
        if attack == "neural-compress":
            # average all q=3-tier codecs
            vals = [
                tpr_at_fpr(v, alpha)
                for (t, p), v in by_key.items()
                if t == attack and "q=3" in p
            ]
            if vals:
                per_attack[attack] = float(np.mean(vals))
        elif (attack, str(param)) in by_key:
            per_attack[attack] = tpr_at_fpr(by_key[(attack, str(param))], alpha)

    cats = defaultdict(list)
    if "None" in per_attack:
        cats["None"].append(per_attack["None"])
    for attack, v in per_attack.items():
        if attack in SUMMARY_METRICS:
            cats[SUMMARY_METRICS[attack][0]].append(v)
    per_category = {c: float(np.mean(v)) for c, v in cats.items()}
    return {"per_attack": per_attack, "per_category": per_category}


def full_attack_grid(records: List[Record], alpha: float = 0.01) -> Dict[str, Dict[str, dict]]:
    """TPR@alpha + mean L0/PSNR for every (transform, param) cell."""
    cells = defaultdict(lambda: defaultdict(list))
    for r in records:
        cells[(r.transform, str(r.param))]["pvalue"].append(r.metrics.get("pvalue"))
        cells[(r.transform, str(r.param))]["l0"].append(r.metrics.get("l0"))
        cells[(r.transform, str(r.param))]["psnr"].append(r.metrics.get("psnr"))
    out: Dict[str, Dict[str, dict]] = defaultdict(dict)
    for (t, p), vals in cells.items():
        pv = [v for v in vals["pvalue"] if v is not None]
        l0 = [v for v in vals["l0"] if v is not None]
        ps = [v for v in vals["psnr"] if v is not None and np.isfinite(v)]
        out[t][p] = {
            "tpr": tpr_at_fpr(pv, alpha) if pv else None,
            "l0": float(np.mean(l0)) if l0 else None,
            "psnr": float(np.mean(ps)) if ps else None,
            "n": len(vals["pvalue"]),
        }
    return dict(out)


def markdown_table(table: Dict[str, dict], title: str = "TPR@1%FPR") -> str:
    """Github-style summary table like the reference's analyzer emit."""
    cats = table["per_category"]
    cols = ["None", "Valuemetric", "Geometric", "Adversarial Purification", "Neural Compression"]
    present = [c for c in cols if c in cats]
    lines = [
        f"| {title} | " + " | ".join(present) + " |",
        "|" + "---|" * (len(present) + 1),
        "| TPR | " + " | ".join(f"{cats[c]:.2f}" for c in present) + " |",
    ]
    return "\n".join(lines)


def latex_table(table: Dict[str, dict]) -> str:
    cats = table["per_category"]
    cols = ["None", "Valuemetric", "Geometric", "Adversarial Purification", "Neural Compression"]
    present = [c for c in cols if c in cats]
    header = " & ".join(present) + r" \\"
    row = " & ".join(f"{cats[c]:.2f}" for c in present) + r" \\"
    return "\n".join([r"\begin{tabular}{" + "c" * len(present) + "}", header, r"\midrule", row, r"\end{tabular}"])


def roc_points(pvals_watermarked, pvals_null):
    """ROC curve (FPR, TPR) + AUC from watermarked vs null p-values —
    the numeric core of the reference's ``plot_roc`` (``analyzer.py:241``).
    Thresholding p-values sweeps the operating point."""
    wm = np.sort(np.asarray(pvals_watermarked, dtype=np.float64))
    null = np.sort(np.asarray(pvals_null, dtype=np.float64))
    thresholds = np.unique(np.concatenate([[0.0], wm, null, [1.0]]))
    tpr = np.searchsorted(wm, thresholds, side="right") / max(len(wm), 1)
    fpr = np.searchsorted(null, thresholds, side="right") / max(len(null), 1)
    auc = float(np.trapezoid(tpr, fpr))
    return fpr, tpr, auc

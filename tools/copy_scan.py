#!/usr/bin/env python3
"""Token-level similarity scan between this repo and the reference.

Guards against transcribed (even renamed) reference files re-entering the
tree: every repo source file is compared, as a stream of code tokens with
comments/docstrings stripped, against every reference Python file of
comparable size, using difflib's longest-matching-subsequence ratio.

Run:  python tools/copy_scan.py [--threshold 0.5] [--json out.json]
Exit status is 1 if any non-adjudicated pair meets the threshold.

Adjudicated pairs (canonical algorithms / API surfaces where similarity is
inherent, reviewed in COMPONENTS.md) are listed in ADJUDICATED below.
"""
import argparse
import difflib
import io
import json
import sys
import tokenize
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

# pair -> reason; these are allowed to exceed the threshold
ADJUDICATED = {
    ("eop_tpu/exp/base_exp.py", "yolox/exp/base_exp.py"):
        "Exp API surface is the spec (abstract methods + merge)",
    ("eop_tpu/exp/base_exp.py", "yolox_24p/exp/base_exp.py"):
        "same (near-identical reference copy)",
    ("eop_tpu/utils/metric.py", "yolox/utils/metric.py"):
        "canonical windowed AverageMeter",
    ("eop_tpu/utils/metric.py", "yolox_24p/utils/metric.py"):
        "same (byte-identical reference copy)",
    ("eop_tpu/data/coco_classes.py", "yolox/data/datasets/coco_classes.py"):
        "COCO's 80 published category names — dataset metadata, not code",
    ("eop_tpu/data/coco_classes.py",
     "yolox_24p/data/datasets/coco_classes.py"):
        "same (byte-identical reference copy)",
}

# Exp config stubs: a handful of hyperparameter assignments whose names and
# values ARE the spec (depth/width/input_size/... must match the reference's
# documented configurations); longest shared runs are single assignment
# statements.  Structure/idiom is our own (config_name, tuple assigns).
_CONFIG_STUBS = (
    "exps/default/", "exps/example/", "load_train/", "load_eval/",
)
_CONFIG_STUB_MAX_TOKENS = 260  # anything larger carries real code — flag it


def _adjudicate(rel_repo, rel_ref, n_tokens):
    reason = ADJUDICATED.get((rel_repo, rel_ref))
    if reason:
        return reason
    if (
        rel_repo.startswith(_CONFIG_STUBS)
        and n_tokens <= _CONFIG_STUB_MAX_TOKENS
    ):
        return "config stub — content is the spec'd hyperparameter set"
    return None


def code_tokens(path):
    """Source file -> list of code tokens, comments/docstrings/NL dropped."""
    try:
        src = path.read_text(errors="replace")
    except OSError:
        return []
    out = []
    prev_was_stmt_end = True  # a STRING right after NEWLINE/INDENT is a docstring
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            kind, text = tok.type, tok.string
            if kind in (tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE,
                        tokenize.INDENT, tokenize.DEDENT, tokenize.ENCODING,
                        tokenize.ENDMARKER):
                if kind in (tokenize.NEWLINE, tokenize.INDENT, tokenize.DEDENT):
                    prev_was_stmt_end = True
                continue
            if kind == tokenize.STRING and prev_was_stmt_end:
                continue  # docstring position
            prev_was_stmt_end = False
            out.append(text)
    except tokenize.TokenizeError:
        pass
    return out


def longest_match_tokens(a, b):
    sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
    return max((m.size for m in sm.get_matching_blocks()), default=0)


def scan(threshold):
    repo_files = sorted(
        p for d in ("eop_tpu", "tools", "exps", "load_train", "load_eval")
        for p in (REPO / d).rglob("*.py")
    ) + [REPO / "bench.py", REPO / "__graft_entry__.py"]
    ref_files = sorted(REFERENCE.rglob("*.py"))
    ref_toks = {p: code_tokens(p) for p in ref_files}

    findings = []
    for rp in repo_files:
        if not rp.exists():
            continue
        a = code_tokens(rp)
        if len(a) < 60:  # tiny files (e.g. __init__) carry no signal
            continue
        best = None
        for fp, b in ref_toks.items():
            if len(b) < 60:
                continue
            # size gate: a transcription keeps rough token count
            if not (0.35 <= len(a) / len(b) <= 3.0):
                continue
            sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
            if sm.real_quick_ratio() < threshold or sm.quick_ratio() < threshold:
                continue
            r = sm.ratio()
            if best is None or r > best[1]:
                best = (fp, r, max((m.size for m in sm.get_matching_blocks()),
                                   default=0))
        if best and best[1] >= threshold:
            rel_r = str(rp.relative_to(REPO))
            rel_f = str(best[0].relative_to(REFERENCE))
            findings.append({
                "repo": rel_r, "reference": rel_f,
                "ratio": round(best[1], 3), "longest_block_tokens": best[2],
                "adjudicated": _adjudicate(rel_r, rel_f, len(a)),
            })
    return findings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()

    findings = scan(args.threshold)
    if args.json:
        args.json.write_text(json.dumps(
            {"threshold": args.threshold, "findings": findings}, indent=1))
    bad = [f for f in findings if not f["adjudicated"]]
    for f in findings:
        tag = "ADJUDICATED" if f["adjudicated"] else "FLAGGED"
        print(f"{tag}  {f['repo']} ~ {f['reference']}  "
              f"ratio={f['ratio']} block={f['longest_block_tokens']}")
        if f["adjudicated"]:
            print(f"            reason: {f['adjudicated']}")
    print(f"\n{len(findings)} pairs >= {args.threshold}; {len(bad)} not adjudicated")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

"""Every benchmark artifact cited in docs/ROADMAP/docstrings must exist and
be non-empty — the repo's evidence policy, made mechanical.

Round 3 and round 4 both shipped claims citing `benchmarks/*.json` files
that were empty or missing the cited rows (VERDICT r4 item 2). This test
scans the tree for `benchmarks/<name>.json|.txt` citations and fails on any
dangling one, so a claim can't merge without its measurement.
"""
import json
import os
import re

import pytest

pytestmark = pytest.mark.smoke

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CITE = re.compile(r"benchmarks/[a-z0-9_]+\.(?:json|txt)")


def _cited_artifacts():
    cites = {}  # artifact -> first citing file
    for base, dirs, files in os.walk(ROOT):
        dirs[:] = [d for d in dirs if d not in
                   (".git", "benchmarks", "__pycache__", ".claude")]
        for fn in files:
            if not fn.endswith((".py", ".md")):
                continue
            path = os.path.join(base, fn)
            try:
                text = open(path, encoding="utf-8").read()
            except (OSError, UnicodeDecodeError):
                continue
            for m in CITE.finditer(text):
                cites.setdefault(m.group(0), os.path.relpath(path, ROOT))
    return cites


def test_cited_benchmark_artifacts_exist_and_are_nonempty():
    cites = _cited_artifacts()
    assert cites, "citation scan found nothing — the regex or walk broke"
    problems = []
    for rel, citer in sorted(cites.items()):
        path = os.path.join(ROOT, rel)
        if not os.path.exists(path):
            problems.append(f"{rel} cited by {citer}: MISSING")
        elif os.path.getsize(path) == 0:
            problems.append(f"{rel} cited by {citer}: EMPTY (0 bytes)")
        elif rel.endswith(".json"):
            text = open(path).read()
            try:  # single pretty-printed document (report.json, eval_curve)
                rows = [json.loads(text)]
            except json.JSONDecodeError:
                try:  # JSONL: one row per line (the benchmark-sweep format)
                    rows = [json.loads(l) for l in text.splitlines()
                            if l.strip()]
                except json.JSONDecodeError as e:
                    problems.append(f"{rel} cited by {citer}: bad JSON ({e})")
                    continue
            if not rows:
                problems.append(f"{rel} cited by {citer}: no JSON rows")
    assert not problems, "dangling evidence citations:\n" + "\n".join(problems)


def test_pipelined_claims_have_pipelined_rows():
    """serve.py's pipelined-dispatch claim cites batch_server.json rows with
    a pipeline_depth field; fit's dispatch_ahead claim cites fit_overlap.json
    rows for ahead=0 and ahead>0. Assert the cited rows actually exist."""
    bs = os.path.join(ROOT, "benchmarks", "batch_server.json")
    fo = os.path.join(ROOT, "benchmarks", "fit_overlap.json")
    for path, pred, what in (
        (bs, lambda r: "pipeline_depth" in r, "pipeline_depth rows"),
        (fo, lambda r: r.get("dispatch_ahead", -1) == 0 and "img_per_s" in r,
         "dispatch_ahead=0 measurement"),
        (fo, lambda r: r.get("dispatch_ahead", -1) > 0 and "img_per_s" in r,
         "dispatch_ahead>0 measurement"),
    ):
        if not os.path.exists(path):
            pytest.fail(f"{os.path.basename(path)} missing")
        with open(path) as f:
            rows = [json.loads(l) for l in f if l.strip()]
        assert any(pred(r) for r in rows), (
            f"{os.path.basename(path)}: no {what} — the feature's claims "
            "are unmeasured (VERDICT r4 item 2)")

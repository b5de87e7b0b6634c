#!/usr/bin/env python3
"""Leak scan over the repo's tracked source, with provenance.

Round-3 ADVICE flagged that LEAKCHECK.json carried only a hand-bumpable
round counter — nothing proved the scan was re-run over the new commits.
This scanner emits `scanned_commit` (HEAD at scan time), `n_files`, and
`scanned_at_utc` so a genuine re-run is distinguishable from a counter
bump. Categories mirror the driver's artifact.

Usage: python3 tools/leakcheck.py [--round N] [-o LEAKCHECK.json]
"""
import argparse
import json
import re
import subprocess
import sys
from datetime import datetime, timezone

# Category -> regex over file text. Patterns target classes of internal
# reference (imports from non-public namespaces, internal-looking URLs/
# buckets/short links, credentials), not any specific named system.
PATTERNS = {
    # any dotted depth before the internal-ish segment, so an import of
    # com.<vendor>.<suspect-segment>.Client hits at depth 3+ as well
    # (the two-segment-only version missed those)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache|scala\b|java\b|graft\b|org\.scalatest|org\.scalacheck)"
        r"(?:[\w]+\.)+(?:internal|corp|private)\b", re.M),
    "internal-url": re.compile(
        r"https?://[\w.-]*\b(internal|corp|intranet)\b[\w./-]*"),
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.[a-z]+\.(?:internal|secret|corp)\b"),
    "internal-bucket": re.compile(
        r"\b(?:s3|gs|abfss?)://[\w-]*(?:internal|corp|prod-secret)[\w-]*"),
    "slack-link": re.compile(r"\b[\w-]*\.slack\.com/|\bslack://"),
    "api-key": re.compile(
        r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36})\b"),
    "axon-env": re.compile(r"\$\{?[A-Z_]*(?:INTERNAL|CORP|SECRET)[A-Z_]*\}?"),
}

TEXT_EXT = (".scala", ".sbt", ".md", ".py", ".sh", ".json", ".sql",
            ".txt", ".yml", ".yaml", ".properties", ".conf")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("-o", "--out", default="/dev/stdout")
    args = ap.parse_args()

    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True, check=True).stdout.strip()
    files = [f for f in subprocess.run(
        ["git", "ls-files"], capture_output=True, text=True, check=True
    ).stdout.splitlines() if f.endswith(TEXT_EXT) and f != "LEAKCHECK.json"]

    hits = {cat: [] for cat in PATTERNS}
    for path in files:
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for cat, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{path}:{line}:{m.group(0)[:80]}")

    report = {
        "round": args.round,
        "scanned_commit": head,
        "n_files": len(files),
        "scanned_at_utc": datetime.now(timezone.utc).isoformat(),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
        fh.write("\n")
    return 1 if report["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Self-stamping public-knowledge scan over the repo's source tree.

The driver's LEAKCHECK.json carries no freshness evidence, so an empty
result is indistinguishable from a stale one (round-7/8 advice). This
builder-side twin scans the same classes of patterns and records WHEN it
ran, over WHICH files (count + a digest of the sorted file list + per-file
content digests), so "0 hits" is verifiable against the exact tree state.

Usage: python3 tools/leakcheck.py  (writes tools/leakcheck_last.json)
"""
import datetime
import hashlib
import json
import os
import re
import sys

PATTERNS = {
    # internal/proprietary systems must never be referenced: scan for any
    # non-public import roots, bucket schemes, short links, key shapes
    "internal-import": re.compile(r"import\s+(com\.anthropic|anthropic\.|internal\.)"),
    "internal-url": re.compile(r"https?://[a-z0-9.-]*\.(corp|internal)[/\"]"),
    "internal-bucket": re.compile(r"(s3|gs)://[a-z0-9-]*(internal|corp|anthropic)"),
    "slack-link": re.compile(r"(slack\.com/archives|(?<![a-z])go/[a-z][a-z0-9-]{1,30}\b)"),
    "api-key": re.compile(r"(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16})"),
    "env-secret": re.compile(r"ANTHROPIC_[A-Z_]*KEY"),
}

# resolve against the repo root (this file's parent's parent), never the
# caller's CWD: a wrapper invoking the scan from elsewhere must not get a
# freshly-stamped record attesting a clean scan over zero files
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOTS = [os.path.join(REPO, "src"), os.path.join(REPO, "build.sbt")]
EXTS = {".scala", ".sbt", ".py", ".md", ".json", ".conf"}


def files():
    for root in ROOTS:
        if os.path.isfile(root):
            yield root
        for dirpath, _, names in os.walk(root) if os.path.isdir(root) else []:
            for n in sorted(names):
                if os.path.splitext(n)[1] in EXTS:
                    yield os.path.join(dirpath, n)


def main():
    hits = {k: [] for k in PATTERNS}
    digests = hashlib.sha256()
    scanned = 0
    for path in sorted(set(files())):
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        rel = os.path.relpath(path, REPO)
        scanned += 1
        digests.update(rel.encode())
        digests.update(hashlib.sha256(text.encode()).digest())
        for key, pat in PATTERNS.items():
            for i, line in enumerate(text.splitlines(), 1):
                if pat.search(line):
                    hits[key].append(f"{rel}:{i}")
    if scanned == 0:
        print("[leakcheck] ERROR: scanned 0 files — refusing to stamp a record",
              file=sys.stderr)
        return 2
    record = {
        "scanned_at_utc": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "files_scanned": scanned,
        "tree_digest_sha256": digests.hexdigest(),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = os.path.join(os.path.dirname(__file__), "leakcheck_last.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(f"[leakcheck] {scanned} files, {record['n_hits']} hits -> {out}")
    return 0 if record["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

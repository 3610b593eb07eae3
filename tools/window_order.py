#!/usr/bin/env python
"""Derive the driver-gate window order from the evidence-age record.

The per-round driver gate checks the FIRST 50 ``queries()`` entries, and
the review policy requires every query's newest driver evidence to be at
most 2 rounds old — so each round the registration order must front-load
(a) queries with NO driver evidence yet (new this round) and (b) queries
whose newest evidence is about to expire. This tool computes that order
mechanically from the committed ``CORRECTNESS_r*.json`` artifacts (each
lists exactly the queries the driver gated that round), so the rotation
stops being hand-maintained:

  * prints every contract query with its newest evidence round;
  * prints the recommended next-round window: no-evidence first, then
    ascending evidence round (ties keep current registration order),
    cut at --window (default 50);
  * with --check, exits non-zero if any query whose evidence expires
    next round (age >= --max-age at the NEXT round's close) is NOT
    inside the current registration's first --window entries — the
    pre-commit guard for the rotation.

Usage: python tools/window_order.py [--check] [--window 50] [--max-age 2]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def uncommitted_driver_artifacts(repo: str) -> list[str]:
    """Driver artifacts (CORRECTNESS_r*/BENCH_r*/bench_details) that are
    untracked or modified per ``git status``.  The evidence table is
    derived from COMMITTED artifacts only, so ordering or checking the
    window while these sit uncommitted silently uses stale evidence —
    the exact slip that recurred five rounds running.  Both --check and
    --emit-order refuse to run until they land (override:
    --allow-dirty-artifacts, for forensic use only)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout
    except Exception:
        return []  # not a git repo / git unavailable: nothing to guard
    pat = re.compile(
        r"(CORRECTNESS_r\d+\.json|BENCH_r\d+\.json|bench_details\.json)$"
    )
    return [
        line[3:]
        for line in out.splitlines()
        if pat.search(line.strip()) and line[:2].strip()
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--max-age", type=int, default=2)
    ap.add_argument("--check", action="store_true")
    ap.add_argument(
        "--emit-order",
        action="store_true",
        help="print the full queries() registration body in recommended"
        " order (q_<name> convention) for a mechanical rotation",
    )
    ap.add_argument(
        "--allow-dirty-artifacts",
        action="store_true",
        help="bypass the uncommitted-driver-artifact guard (forensic"
        " reads only; never for an actual rotation)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.check or args.emit_order:
        dirty = uncommitted_driver_artifacts(repo)
        if dirty and not args.allow_dirty_artifacts:
            print(
                "UNCOMMITTED DRIVER ARTIFACTS — the evidence table below"
                " would be stale. Commit these first (or pass"
                " --allow-dirty-artifacts for a forensic read):",
                file=sys.stderr,
            )
            for p in dirty:
                print(f"  {p}", file=sys.stderr)
            return 2
    evidence: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name, row in json.load(open(path)).items():
            ok = isinstance(row, dict) and row.get("rows_match") and (
                row.get("hash_match") is not False
            ) and not row.get("err")
            if ok:
                evidence[name] = max(evidence.get(name, 0), rnd)
    latest = max(rounds) if rounds else 0
    names = list(entry_mod.queries())
    pos = {n: i for i, n in enumerate(names)}

    def key(n: str):
        # no evidence first, then oldest evidence, stable on current order
        return (evidence.get(n, -1), pos[n])

    recommended = sorted(names, key=key)
    if args.emit_order:
        # paste-able queries() body in the recommended full order —
        # the next round's rotation becomes a mechanical replace
        print(f"# recommended registration order after round {latest}")
        for i, n in enumerate(recommended):
            marker = ""
            if i == args.window:
                marker = (
                    "        # ---- driver gate window"
                    f" ({args.window}) ends here ----\n"
                )
            ev = evidence.get(n)
            tag = f"r{ev:02d}" if ev else "NO-EVIDENCE"
            print(f'{marker}        "{n}": q_{n},  # {tag}')
        return 0
    print(f"# evidence through round {latest}; {len(names)} contract queries")
    for n in recommended[: args.window]:
        ev = evidence.get(n)
        print(f"{n}\t{'r%02d' % ev if ev else 'NO-EVIDENCE'}")
    print(f"# ---- recommended window ({args.window}) ends here ----")

    if args.check:
        current_window = set(names[: args.window])
        # queries whose evidence would be STRICTLY older than max-age at
        # the close of round latest+1 — age (latest+1) - ev > max_age,
        # i.e. ev <= latest - max_age — plus no-evidence queries, must
        # sit inside the current window (max-age-old evidence is still
        # within policy; it expires the round AFTER)
        must = [
            n
            for n in names
            if evidence.get(n, -(10**9)) <= latest - args.max_age
        ]
        # explicit, visible waivers: when a round's window cannot fit
        # every no-evidence/expiring query (e.g. 46 expiring + 5 new),
        # the registration may declare a documented one-round aging —
        # the waiver must name the query, the reason, AND the newest
        # CORRECTNESS round it was granted under; it EXPIRES as soon as
        # a newer round's artifact lands, so the next round's rotation
        # cannot silently inherit it. Printed either way, auditable.
        raw = getattr(entry_mod, "WINDOW_AGING_EXCEPTIONS", {})
        waivers = {}
        for n, w in raw.items():
            granted = w.get("granted_at_round") if isinstance(w, dict) else None
            reason = w.get("reason") if isinstance(w, dict) else str(w)
            if granted is not None and latest > granted:
                print(
                    f"WAIVER EXPIRED (granted at r{granted:02d},"
                    f" evidence now through r{latest:02d}): {n} — must"
                    f" enter the window or be re-granted explicitly"
                )
                continue
            waivers[n] = reason
        for n in sorted(set(must) & set(waivers)):
            print(f"WAIVED (documented aging): {n} — {waivers[n]}")
        must = [n for n in must if n not in waivers]
        missing = [n for n in must if n not in current_window]
        if missing:
            print(
                f"ROTATION GAP: {len(missing)} expiring/no-evidence queries"
                f" outside the first {args.window} registration entries:",
                file=sys.stderr,
            )
            for n in missing:
                print(f"  {n} (evidence: {evidence.get(n)})", file=sys.stderr)
            return 1
        print(
            f"check ok: all {len(must)} expiring/no-evidence queries are"
            f" inside the first {args.window} entries"
        )
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # head/tail on the emit output
        sys.exit(0)

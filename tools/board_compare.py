#!/usr/bin/env python3
"""Mechanical cross-board comparison (r16 verdict ask #1: a common-row
ratio that needs no narrative, or one that indicts a named drift
window mechanically).

Usage: board_compare.py <board_a.json> <board_b.json> [--tau 1.25]

Reads two graft.Bench board JSONs and prints:
  - provenance of both sides (git HEAD, fixture fingerprint, catalog
    hash) so "same code? same data?" is answered by the tool;
  - the all-common-rows total ratio a/b;
  - per-segment sentinel context for side A (when it carries a
    sentinel_track): segments whose bracketing cpu/shuffle samples
    exceed tau x the run's own mid-run median are LOADED; rows whose
    minimum came from a loaded segment are listed and a quiet-rows
    ratio is printed next to the all-rows one;
  - the top movers with their segment and load classification.

Interpretation contract (the part that makes the round-close
mechanical): if quiet-rows ratio ~= all-rows ratio, the drift is
BROAD (environment window or real regression across the board —
distinguish by provenance + a second separated run); if the two
diverge, the drift is LOCALIZED to the named loaded segments and the
quiet-rows ratio is the comparable number.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tau = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--tau"):
            tau = float(a.split("=", 1)[1]) if "=" in a else tau
    if len(args) != 2:
        sys.exit(__doc__)
    a, b = load(args[0]), load(args[1])
    for label, d in (("A", a), ("B", b)):
        print(f"{label}: total={d.get('value', 0):.1f}s rows={len(d.get('queries', {}))} "
              f"head={d.get('git_head', '?')[:12]} fixtures={d.get('fixture_fingerprint', '?')[:12]} "
              f"catalog={d.get('catalog_hash', '?')[:12]} sf={d.get('sf', '?')}")
    if a.get("catalog_hash") and a.get("catalog_hash") == b.get("catalog_hash"):
        print("catalog: identical")
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    ra, rb = sum(qa[q] for q in common), sum(qb[q] for q in common)
    print(f"common rows: {len(common)}  A={ra:.1f}s B={rb:.1f}s  all-rows ratio={ra / rb:.3f}")

    track, seg = a.get("sentinel_track"), a.get("query_seg")
    if not track or not seg:
        print("side A carries no sentinel track — pre-r17 board; ratio above is all there is")
        return
    mid = track[1:-1] or track
    mc = statistics.median(t["cpu"] for t in mid)
    ms = statistics.median(t["shuffle"] for t in mid)
    print(f"A mid-run sentinel medians: cpu={mc:.3f}s shuffle={ms:.3f}s (tau={tau})")

    def loaded(i):
        pts = [track[max(min(i, len(track) - 1), 0)], track[min(i + 1, len(track) - 1)]]
        return any(t["cpu"] > mc * tau or t["shuffle"] > ms * tau for t in pts)

    loaded_segs = sorted({seg[q] for q in common if q in seg and loaded(seg[q])})
    quiet = [q for q in common if q in seg and not loaded(seg[q])]
    if quiet:
        rq, rbq = sum(qa[q] for q in quiet), sum(qb[q] for q in quiet)
        print(f"loaded segments (A): {loaded_segs}")
        print(f"quiet-segment rows: {len(quiet)}/{len(common)}  ratio={rq / rbq:.3f}")
        verdict = ("BROAD (environment window or cross-board regression; "
                   "check provenance + a second separated run)"
                   if abs(rq / rbq - ra / rb) < 0.03
                   else "LOCALIZED to the loaded segments; quiet-rows ratio is the comparable number")
        print(f"drift shape: {verdict}")
    movers = sorted(((qa[q] / qb[q], q) for q in common if qb[q] > 0.3), reverse=True)[:10]
    print("top movers (A/B, segment, loaded?):")
    for r, q in movers:
        s = seg.get(q)
        flag = "loaded" if (s is not None and loaded(s)) else "quiet"
        print(f"  {q}: {r:.2f}x ({qa[q]:.2f} vs {qb[q]:.2f}) seg={s} {flag}")


if __name__ == "__main__":
    main()

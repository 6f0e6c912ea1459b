#!/usr/bin/env python3
"""Mechanical cross-board comparison (r16 verdict ask #1: a common-row
ratio that needs no narrative, or one that indicts a named drift
window mechanically).

Usage: board_compare.py <board_a.json> <board_b.json> [--tau=1.25 | --tau 1.25]

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
    tau = 1.25
    args = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("--tau"):
            if "=" in tok:
                tau = float(tok.split("=", 1)[1])
            elif i + 1 < len(argv):  # space-separated form: --tau 1.25
                tau = float(argv[i + 1])
                i += 1
            else:
                sys.exit("--tau needs a value (--tau=1.25 or --tau 1.25)")
        else:
            args.append(tok)
        i += 1
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
    ratio_all = ra / rb if rb > 0 else float("nan")
    print(f"common rows: {len(common)}  A={ra:.1f}s B={rb:.1f}s  all-rows ratio={ratio_all:.3f}")

    track, seg = a.get("sentinel_track"), a.get("query_seg")
    if not track or not seg:
        print("side A carries no sentinel track — pre-r17 board; ratio above is all there is")
        return
    mid = track[1:-1] or track
    # every query-shaped sentinel in the track: the r17 cpu/shuffle
    # probe pair plus (r18+) the board-shaped catalog sentinels (s_*).
    # Host-load fields are context/steal flags, not tau-rule metrics.
    metrics = [k for k in track[0] if k not in ("i", "load1", "steal_pct")]
    med = {m: statistics.median(t[m] for t in mid) for m in metrics}
    print("A mid-run sentinel medians: "
          + " ".join(f"{m}={med[m]:.3f}s" for m in metrics) + f" (tau={tau})")
    if "load1" in track[0]:
        ml = statistics.median(t["load1"] for t in mid)
        mx = max(t.get("steal_pct", 0.0) for t in track)
        print(f"A host load: median load1={ml:.1f} max steal={mx * 100:.1f}%")

    def seg_loaded(t):
        over = any(med[m] > 0 and t[m] > med[m] * tau for m in metrics)
        # a negative sentinel marks a FAILED probe (Bench convention):
        # the segment is untrustworthy, never extra-quiet
        broken = any(t[m] < 0 for m in metrics)
        return over or broken or t.get("steal_pct", 0.0) > 0.05

    def loaded(i):
        pts = [track[max(min(i, len(track) - 1), 0)], track[min(i + 1, len(track) - 1)]]
        return any(seg_loaded(t) for t in pts)

    loaded_segs = sorted({seg[q] for q in common if q in seg and loaded(seg[q])})
    quiet = [q for q in common if q in seg and not loaded(seg[q])]
    if quiet:
        rq, rbq = sum(qa[q] for q in quiet), sum(qb[q] for q in quiet)
        print(f"loaded segments (A): {loaded_segs}")
        if rbq > 0 and rb > 0:
            ratio_quiet = rq / rbq
            print(f"quiet-segment rows: {len(quiet)}/{len(common)}  ratio={ratio_quiet:.3f}")
            verdict = ("BROAD (environment window or cross-board regression; "
                       "check provenance + a second separated run)"
                       if abs(ratio_quiet - ratio_all) < 0.03
                       else "LOCALIZED to the loaded segments; quiet-rows ratio is the comparable number")
            print(f"drift shape: {verdict}")
        else:
            print(f"quiet-segment rows: {len(quiet)}/{len(common)}  "
                  "ratio undefined (side B quiet rows sum to 0)")
    movers = sorted(((qa[q] / qb[q], q) for q in common if qb[q] > 0.3), reverse=True)[:10]
    print("top movers (A/B, segment, loaded?):")
    for r, q in movers:
        s = seg.get(q)
        flag = "loaded" if (s is not None and loaded(s)) else "quiet"
        print(f"  {q}: {r:.2f}x ({qa[q]:.2f} vs {qb[q]:.2f}) seg={s} {flag}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Round-to-round bench adjudication in one command (VERDICT-r18 #6).

Reads two BENCH_FULL.json files (the per-row/per-run host-stamp
artifacts Bench writes), joins rows, and classifies every delta above
the threshold by the stamp-attribution algebra documented in
BASELINE.md ("Round-17 probe telemetry: attributing an out-of-band
try" + the round-18 per-ROW stamp reading rules):

  - steal / psi / iowait elevated on the reported run  -> host-stall
  - busy%  >>  100*cpu/(sec*ncpus) (the row's own share) -> external
    competition (another process on the host; invisible to steal)
  - cpu/gc up vs the other side at matched host stamps  -> self-work
    (the row itself did more -- the only class that is a real mover)
  - new value inside its documented BASELINE.md band     -> in-band
  - none of the above                                    -> unexplained

Usage:
  python3 tools/bench_diff.py OLD.json NEW.json \
      [--threshold 0.4] [--bands tools/bands.json] [--ncpus 32]

Output: a markdown table (paste into BASELINE.md), movers sorted by
|delta| descending, plus added/removed row sums and the two totals.
Only Python stdlib; runs anywhere the JSON artifacts exist.
"""
import argparse
import json
import os
import sys

STEAL_STORM_PCT = 5.0     # matches SPARK_GRAFT_STEAL_RETRY_PCT default
PSI_STORM_MS_PER_SEC = 50.0   # >5% of the run stalled waiting for CPU
BUSY_EXCESS_PTS = 20.0    # busy% this far above own share => competitor
SELF_WORK_RATIO = 1.2     # cpu or gc 20% up at matched host => self-work


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def reported_run(entry):
    """Index of the run whose sec the row reported (median selection
    keeps the reported value equal to one runs[] entry)."""
    runs = entry.get("runs") or entry.get("tries") or []
    sec = entry.get("sec", -1.0)
    if not runs:
        return None
    best, bi = None, None
    for i, r in enumerate(runs):
        d = abs(r - sec)
        if best is None or d < best:
            best, bi = d, i
    return bi


def stamp(entry, key, idx):
    arr = entry.get(key) or []
    if idx is None or idx >= len(arr):
        return -1.0
    return arr[idx]


def classify(name, old_e, new_e, delta, bands, ncpus):
    """Attribution for one mover; returns (label, evidence)."""
    ev = []
    # 1) documented band: a new value inside its band is in-band no
    #    matter what the old run once read (warm-context rule)
    if name in bands and new_e is not None:
        lo, hi = bands[name]
        if lo <= new_e.get("sec", -1) <= hi:
            return ("in-band", "new %.2f inside documented band [%s, %s]"
                    % (new_e["sec"], lo, hi))
    slower = new_e if delta > 0 else old_e
    label_side = "new" if delta > 0 else "old"
    if slower is None:
        # pre-r18 BENCH files carry no per-row stamps -- the delta is
        # real but cannot be attributed from the JSON alone
        return ("no-stamps(%s)" % label_side, "")
    i = reported_run(slower)
    sec = slower.get("sec", -1.0)
    steal = stamp(slower, "steal", i)
    iow = stamp(slower, "iow", i)
    busy = stamp(slower, "busy", i)
    psi = stamp(slower, "psi_ms", i)
    cpu = stamp(slower, "cpu", i)
    gc = stamp(slower, "gc", i)
    ev.append("%s run stamps: steal %.1f%% iow %.1f%% busy %.1f%% "
              "psi %.0fms cpu %.1fs gc %.1fs" %
              (label_side, steal, iow, busy, psi, cpu, gc))
    # a resampled row whose every run still stamped stormy reported the
    # stamped all-stormy fallback median -- name that in the evidence
    steals = [s for s in (slower.get("steal") or []) if s >= 0]
    if len(steals) > 3 and steals and min(steals) > STEAL_STORM_PCT:
        ev.append("all-stormy fallback after resample (%d runs, min "
                  "steal %.1f%%)" % (len(steals), min(steals)))
    # 2) host stall on the slower side's reported run
    if steal > STEAL_STORM_PCT or iow > STEAL_STORM_PCT or \
       (sec > 0 and psi > PSI_STORM_MS_PER_SEC * sec):
        return ("host-stall(%s)" % label_side, "; ".join(ev))
    # 3) external competition: busy far above the row's own share
    if sec > 0 and cpu >= 0 and busy >= 0:
        share = 100.0 * cpu / (sec * ncpus)
        if busy - share > BUSY_EXCESS_PTS:
            ev.append("busy %.1f%% vs own share %.1f%%" % (busy, share))
            return ("external-competition(%s)" % label_side, "; ".join(ev))
    # 4) self-work: the slower side's own cpu/gc is genuinely up
    other = old_e if delta > 0 else new_e
    if other is not None:
        j = reported_run(other)
        ocpu = stamp(other, "cpu", j)
        ogc = stamp(other, "gc", j)
        if cpu > 0 and ocpu > 0 and cpu > ocpu * SELF_WORK_RATIO:
            ev.append("cpu %.1fs vs %.1fs" % (cpu, ocpu))
            return ("self-work", "; ".join(ev))
        if gc > 0.5 and ogc >= 0 and gc > max(ogc * SELF_WORK_RATIO, 0.5):
            ev.append("gc %.1fs vs %.1fs" % (gc, ogc))
            return ("self-work(gc)", "; ".join(ev))
    # 5) an IMPROVEMENT none of the stamp rules claim: the old read was
    #    quiet-stamped yet slower -- the measured shared-battery-JVM
    #    context class (BASELINE.md round-18/19: same work costs less in
    #    a fresh or less-loaded JVM; q_sql_tvf_knn adjudication). Only
    #    ADVERSE movers stay "unexplained" -- they are the actionable
    #    ones.
    if delta < 0:
        return ("improved(context)", "; ".join(ev))
    return ("unexplained", "; ".join(ev))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--bands", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bands.json"))
    ap.add_argument("--ncpus", type=int, default=32)
    args = ap.parse_args()

    a, b = load(args.old), load(args.new)
    bands = {}
    if os.path.exists(args.bands):
        bands = {k: v for k, v in load(args.bands).items()
                 if isinstance(v, list) and len(v) == 2}

    # rows + probes are both per-name stamp objects; merge each side
    def entries(d):
        out = dict(d.get("rows") or {})
        for k, v in (d.get("probes") or {}).items():
            out[k] = v
        return out

    ea, eb = entries(a), entries(b)
    qa = a.get("queries") or {k: v.get("sec", -1) for k, v in ea.items()}
    qb = b.get("queries") or {k: v.get("sec", -1) for k, v in eb.items()}

    movers, added, removed = [], [], []
    for name in sorted(set(qa) | set(qb)):
        va, vb = qa.get(name), qb.get(name)
        if va is None:
            added.append((name, vb))
            continue
        if vb is None:
            removed.append((name, va))
            continue
        if va < 0 or vb < 0:
            movers.append((name, va, vb, float("nan"), "errored", ""))
            continue
        delta = vb - va
        if abs(delta) >= args.threshold:
            label, ev = classify(name, ea.get(name), eb.get(name),
                                 delta, bands, args.ncpus)
            movers.append((name, va, vb, delta, label, ev))

    movers.sort(key=lambda m: -abs(m[3]) if m[3] == m[3] else 0)

    print("## bench diff: %s -> %s (threshold %.1f s)" %
          (args.old, args.new, args.threshold))
    print()
    print("totals: %.1f s (steal %.2f%%, n=%s) -> %.1f s (steal %.2f%%, "
          "n=%s)" % (a.get("value", -1), a.get("steal_pct", -1),
                     a.get("n", "?"), b.get("value", -1),
                     b.get("steal_pct", -1), b.get("n", "?")))
    print()
    if movers:
        print("| row | old | new | delta | attribution | evidence |")
        print("|---|---|---|---|---|---|")
        for name, va, vb, d, label, ev in movers:
            print("| %s | %.2f | %.2f | %+.2f | %s | %s |" %
                  (name, va, vb, d, label, ev))
    else:
        print("no movers above threshold.")
    if added:
        print()
        print("added rows (%d, sum %.1f s): %s" %
              (len(added), sum(v for _, v in added if v and v > 0),
               ", ".join("%s=%.2f" % (n, v) for n, v in added)))
    if removed:
        print()
        print("removed rows (%d, sum %.1f s): %s" %
              (len(removed), sum(v for _, v in removed if v and v > 0),
               ", ".join("%s=%.2f" % (n, v) for n, v in removed)))
    unexplained = [m for m in movers if m[4] == "unexplained"]
    print()
    print("summary: %d movers, %d unexplained%s" %
          (len(movers), len(unexplained),
           " (" + ", ".join(m[0] for m in unexplained) + ")"
           if unexplained else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())

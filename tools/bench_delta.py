"""Frozen bench-delta methodology (round-12 verdict #2): compare two
BENCH_DETAIL.json payloads MODE-TO-MODE only — warm-isolated retimes
against warm-isolated retimes, cold pipeline-sweep times against cold
pipeline-sweep times — never across modes. Cross-mode comparison is
how round 12's "-17%" headline happened: r11 published cache-reuse
sweep numbers, r12 published isolated retimes, and per-query deltas of
±15 s appeared with zero code change (cache-attribution order of the
shared _tracked_persist inputs). Warm numbers are attribution-STABLE
by construction — bench.py drains all caches before each retime, so
every warm time includes that query's own shared-input build — which
makes warm-to-warm deltas explainable by code diffs alone.

    python tools/bench_delta.py OLD.json NEW.json [-o BENCH_DELTA_rN.md]

OLD/NEW are BENCH_DETAIL.json files (carry `cold_sweep` and
`warm_retimes`); a git ref works too: `r12:BENCH_DETAIL.json` is read
via `git show`. Queries present in only one file are listed, never
diffed. Deltas under the noise floor (0.5 s) are suppressed.
"""

from __future__ import annotations

import json
import subprocess
import sys

NOISE_S = 0.5


def _load(path: str) -> dict:
    if ":" in path and not path.startswith("/") and not path[1:3] == ":\\":
        out = subprocess.run(
            ["git", "show", path], stdout=subprocess.PIPE, check=True
        )
        return json.loads(out.stdout.decode())
    with open(path) as fh:
        return json.load(fh)


def _mode_section(title: str, old: dict, new: dict) -> list:
    lines = [f"## {title}", ""]
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    tot_o = sum(old[k] for k in common)
    tot_n = sum(new[k] for k in common)
    lines.append(
        "Common-query totals: %.1f s -> %.1f s (%+.1f s over %d queries)"
        % (tot_o, tot_n, tot_n - tot_o, len(common))
    )
    lines.append("")
    deltas = sorted(
        ((new[k] - old[k], k) for k in common), reverse=True
    )
    reg = [(d, k) for d, k in deltas if d > NOISE_S]
    imp = [(d, k) for d, k in deltas if d < -NOISE_S]
    if reg:
        lines.append("Regressions > %.1f s:" % NOISE_S)
        lines += [
            "- %s: %.2f -> %.2f (%+.2f s)" % (k, old[k], new[k], d)
            for d, k in reg
        ]
    else:
        lines.append("No regressions above the %.1f s noise floor." % NOISE_S)
    lines.append("")
    if imp:
        lines.append("Improvements > %.1f s:" % NOISE_S)
        lines += [
            "- %s: %.2f -> %.2f (%+.2f s)" % (k, old[k], new[k], d)
            for d, k in sorted(imp)
        ]
        lines.append("")
    if only_new:
        lines.append(
            "New queries (no old-mode twin, not diffed): "
            + ", ".join(only_new)
        )
    if only_old:
        lines.append(
            "Removed/unretimed queries: " + ", ".join(only_old)
        )
    lines.append("")
    return lines


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "-o"]
    out_path = None
    if "-o" in sys.argv:
        out_path = sys.argv[sys.argv.index("-o") + 1]
        args = [a for a in args if a != out_path]
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old, new = _load(args[0]), _load(args[1])
    lines = [
        "# Bench delta (mode-to-mode, frozen methodology)",
        "",
        "Old: `%s` (sf %s) -> New: `%s` (sf %s). Modes never cross:"
        % (args[0], old.get("sf"), args[1], new.get("sf")),
        "warm-isolated retimes diff only against warm-isolated retimes"
        " (attribution-stable: caches drained before each), cold"
        " pipeline-sweep times only against cold sweeps (intra-sweep"
        " cache reuse is real but ORDER-dependent — treat cold deltas"
        " as pipeline-mode indicators, not per-query truth).",
        "",
    ]
    lines += _mode_section(
        "Warm-isolated retimes (headline, code-diff-explainable)",
        old.get("warm_retimes") or {},
        new.get("warm_retimes") or {},
    )
    lines += _mode_section(
        "Cold pipeline sweep (cache-reuse mode)",
        old.get("cold_sweep") or {},
        new.get("cold_sweep") or {},
    )
    text = "\n".join(lines)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(text + "\n")
        print("wrote %s" % out_path)
    else:
        print(text)


if __name__ == "__main__":
    main()

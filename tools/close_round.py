"""One-command round close: refresh every round-close artifact in
lockstep so the registry, parity evidence, plan audit, query index, and
bench numbers can never drift apart (round 7 refreshed them by hand and
needed two PARITY reruns because the registry moved underneath).

    python tools/close_round.py <round_no> [--sf sf0.01] [--skip-bench]

Runs, in order:
  1. tools/gen_query_index.py      -> docs/QUERIES.md
  2. tools/plan_sweep.py           -> PLANS.json (fails on cartesian /
                                      row-Python regressions)
  3. scripts/parity_artifact.py    -> PARITY_r{N}.json at the driver's
                                      sf0.01 scale (full registry)
  4. bench.py                      -> BENCH_LOCAL_r{N}.json (the
                                      driver's own BENCH_r{N}.json is
                                      recorded by the round driver; this
                                      local copy is the builder's
                                      evidence)
and exits non-zero the moment any step does.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **env):
    print("close-round: %s" % " ".join(cmd), flush=True)
    e = dict(os.environ)
    e.update(env)
    r = subprocess.run(cmd, cwd=ROOT, env=e)
    if r.returncode != 0:
        print("close-round: FAILED at %s" % cmd, file=sys.stderr)
        sys.exit(r.returncode)


def check_tree_clean() -> None:
    """FRESHNESS GUARD (round-12 verdict #3): the close artifacts must
    be generated from the tree that gets committed — refuse to run
    while ``bamboo_spark/`` has uncommitted changes, because artifacts
    generated now would describe a tree that later source commits
    silently invalidate. Commit the source first, then close."""
    r = subprocess.run(
        ["git", "status", "--porcelain", "--", "bamboo_spark/"],
        cwd=ROOT, stdout=subprocess.PIPE,
    )
    dirty = [ln for ln in r.stdout.decode().splitlines() if ln.strip()]
    if dirty:
        print(
            "close-round: REFUSED — bamboo_spark/ has uncommitted "
            "changes; the artifacts would not describe the committed "
            "tree:\n  " + "\n  ".join(dirty[:20]),
            file=sys.stderr,
        )
        sys.exit(3)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if not args or not args[0].isdigit():
        print(__doc__)
        sys.exit(2)
    round_no = args[0]
    sf = "sf0.01"
    if "--sf" in args:
        sf = args[args.index("--sf") + 1]
    py = sys.executable
    check_tree_clean()
    run([py, "tools/gen_query_index.py"])
    run([py, "tools/plan_sweep.py"])
    run([py, "scripts/parity_artifact.py", round_no, sf])
    if "--skip-bench" not in args:
        out = os.path.join(ROOT, "BENCH_LOCAL_r%02d.json" % int(round_no))
        with open(out, "w") as fh:
            r = subprocess.run(
                [py, "bench.py"],
                cwd=ROOT,
                stdout=subprocess.PIPE,
                env={
                    **os.environ,
                    "SPARK_GRAFT_SF_DIR": "/root/testdata/" + sf.replace(
                        "sf", "sf"
                    ),
                },
            )
            if r.returncode != 0:
                sys.exit(r.returncode)
            # bench prints ONE JSON line last — keep only that
            lines = [
                ln
                for ln in r.stdout.decode().splitlines()
                if ln.strip().startswith("{")
            ]
            fh.write(lines[-1] + "\n")
        print("close-round: wrote %s" % out)
    print("close-round: all artifacts refreshed for round %s" % round_no)


if __name__ == "__main__":
    main()

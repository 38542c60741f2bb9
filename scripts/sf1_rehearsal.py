"""One-shot sf1 scale rehearsal: rebuild the 20M-turn index via
spark-submit (the production deployment shape — fresh JVM, --py-files
zip, cold Python workers) and run the 3-query latency regression
against it (bench.py --sf1-queries).

This is the repeatable form of the protocol recorded in BENCH.md
("Scale rehearsal one order up"): /tmp is wiped between sessions, so
the persisted index cannot be kept — this script re-creates it and
re-measures in one command. Determinism check: every rehearsal so far
produced identical per-segment posting counts (19.68M +- 0.01M) and
vocabulary (62,742); the script prints both so drift is visible.

Usage (from the repo root):
    python scripts/sf1_rehearsal.py [--turns 20000000] [--segments 16]
                                    [--out /tmp/ix_sf1_r4] [--skip-build]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=20_000_000)
    ap.add_argument("--segments", type=int, default=16)
    ap.add_argument("--out", default="/tmp/ix_sf1_r4")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing index at --out")
    args = ap.parse_args()

    if not args.skip_build:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "make_dist.py")],
            check=True, cwd=REPO,
        )
        build = subprocess.run(
            [
                "spark-submit", "--master", "local[32]",
                "--driver-memory", "64g",
                "--py-files", os.path.join(REPO, "dist", "whoosh_spark.zip"),
                os.path.join(REPO, "scripts", "build_index_job.py"),
                "--turns", str(args.turns),
                "--segments", str(args.segments),
                "--out", args.out,
            ],
            cwd=REPO, capture_output=True, text=True,
        )
        if build.returncode != 0:
            # surface the captured diagnostics — a silent CalledProcessError
            # after a 5-minute build helps nobody
            sys.stderr.write(build.stdout[-4000:] + "\n" + build.stderr[-4000:])
            sys.exit(build.returncode)
        # build_index_job prints ONE JSON line (wall, turns/s, per-segment
        # posting/term counts) as its last stdout line — surface it
        json_lines = [ln for ln in build.stdout.splitlines()
                      if ln.startswith("{")]
        if not json_lines:
            sys.stderr.write("build succeeded but emitted no JSON stats "
                             "line; raw tail:\n" + build.stdout[-4000:] + "\n")
            sys.exit(2)
        stats = json.loads(json_lines[-1])
        print(json.dumps({
            "build_wall_sec": stats["wall_sec"],
            "turns_per_sec": stats["turns_per_sec"],
            "vocab_per_segment": sorted(
                {s["n_terms"] for s in stats["segments"].values()}),
            "postings_total": sum(
                s["n_postings"] for s in stats["segments"].values()),
        }))

    # SPARK_GRAFT_SF1_TURNS drives the synth docs frame open_segments
    # joins stored fields from — it must match the built index's corpus
    env = dict(os.environ, SPARK_GRAFT_SF1_INDEX=args.out,
               SPARK_GRAFT_SF1_TURNS=str(args.turns))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--sf1-queries"],
        check=True, cwd=REPO, env=env,
    )


if __name__ == "__main__":
    main()

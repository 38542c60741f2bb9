"""Percolation at large standing-rule-set scale.

Substantiates the "O(1) plan size in rule count" claim of the indexed
percolation tier (whoosh_spark/streaming/percolate.py::percolate_indexed)
at the rule counts a real alerting/routing deployment carries: the rules
ride as broadcast DATA through ONE kernel action, so wall time should
grow with match volume, not with plan size — the plan-branch tier
(`percolate`) at these counts would be a 10^4-branch union that Catalyst
cannot even plan in reasonable time.

Usage:
    python scripts/bench_percolate_scale.py [n_docs] [rule_counts...]
    # defaults: 200000 docs; 1000 10000 50000 100000 rules

Rules are deterministic mixes of Term / And / Or / AndNot / Phrase over
the synthetic transcript vocabulary (same generator as the registry's
percolation entries, scaled out), so every tier exercises the boolean
AND the positional kernel paths.
"""

import json
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from whoosh_spark import query as Q  # noqa: E402
from whoosh_spark.fields import transcript_schema  # noqa: E402
from whoosh_spark.streaming.percolate import percolate_indexed  # noqa: E402
from whoosh_spark.transcripts import synth_turns  # noqa: E402

VOCAB = (
    "spark shuffle partition broadcast join hash merge sort scan window "
    "filter cache executor driver stage task memory disk network skew "
    "index query search score rank term phrase segment block posting "
    "stream batch micro commit checkpoint resume lineage metric count"
).split()


def make_rules(n: int) -> dict:
    """n deterministic rules, selectivity-weighted like a real alerting
    rule base (mostly conjunctions/phrases, few bare terms) so match
    volume measures kernel throughput rather than degenerate
    every-rule-matches-every-doc duplication."""
    rules = {}
    nv = len(VOCAB)
    for i in range(n):
        a = VOCAB[i % nv]
        b = VOCAB[(i * 7 + 3) % nv]
        c = VOCAB[(i * 13 + 5) % nv]
        d = VOCAB[(i * 17 + 11) % nv]
        kind = i % 10
        if kind == 0:
            q = Q.Term("text", a)
        elif kind <= 3:
            q = Q.And([Q.Term("text", a), Q.Term("text", b),
                       Q.Term("text", c)])
        elif kind <= 6:
            q = Q.And([Q.Term("text", b), Q.Term("text", c),
                       Q.Term("text", d)])
        elif kind == 7:
            q = Q.AndNot(Q.And([Q.Term("text", a), Q.Term("text", c)]),
                         Q.Term("text", b))
        else:
            q = Q.Phrase("text", [a, b])
        rules[f"r{i}"] = q
    return rules


def make_deep_rules(n: int) -> dict:
    """n deterministic ARBITRARY-DEPTH rules exercising the r5 program
    path (percolate.py::_deep_rule): 3-level CNF/DNF nests with inner
    boost / minmatch / scale / DisMax tiebreak — every rule routes
    through the stack-machine tier, none qualifies for the flat or
    grouped fast paths."""
    rules = {}
    nv = len(VOCAB)
    for i in range(n):
        a, b, c, d = (VOCAB[i % nv], VOCAB[(i * 7 + 3) % nv],
                      VOCAB[(i * 13 + 5) % nv], VOCAB[(i * 17 + 11) % nv])
        kind = i % 4
        if kind == 0:
            q = Q.And([Q.Or([Q.And([Q.Term("text", a), Q.Term("text", b)]),
                             Q.Term("text", c, boost=2.0)]),
                       Q.Term("text", d)])
        elif kind == 1:
            q = Q.Or([Q.And([Q.Or([Q.Term("text", a), Q.Term("text", b)],
                                  boost=1.5),
                             Q.Term("text", c)]),
                      Q.Term("text", d, boost=0.5)])
        elif kind == 2:
            q = Q.And([Q.Or([Q.Term("text", a), Q.Term("text", b),
                             Q.Term("text", c)], scale=0.5, minmatch=2),
                       Q.Term("text", d)])
        else:
            q = Q.And([Q.DisjunctionMax([Q.Term("text", a),
                                         Q.Term("text", b)], tiebreak=0.3),
                       Q.Term("text", c)])
        rules[f"d{i}"] = q
    return rules


def main() -> None:
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(nums[0]) if nums else 200_000
    counts = [int(x) for x in nums[1:]] or [1000, 10_000, 50_000,
                                            100_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("percolate-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_turns(spark, n_docs).persist()
    docs.count()
    deep = "--deep" in sys.argv
    mixed = "--mixed" in sys.argv
    out = {"metric": "percolate_scale", "n_docs": n_docs,
           "rule_shape": ("deep" if deep else
                          "mixed" if mixed else "flat"),
           "tiers": {}}
    for n in counts:
        if deep:
            rules = make_deep_rules(n)
        elif mixed:
            # the flat hot path with a handful of deep rules riding the
            # same broadcast — measures the cost the program columns add
            # to the flat rules' kernel (should be ~nil)
            rules = {**make_rules(n - 8), **make_deep_rules(8)}
        else:
            rules = make_rules(n)
        t0 = time.perf_counter()
        matches = percolate_indexed(spark, docs, rules,
                                    transcript_schema())
        rows = matches.count()
        wall = time.perf_counter() - t0
        out["tiers"][str(n)] = {"rules": n, "match_rows": rows,
                                "wall_sec": round(wall, 2)}
        print(json.dumps(out["tiers"][str(n)]), flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

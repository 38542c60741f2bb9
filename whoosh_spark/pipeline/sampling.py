"""Deterministic corpus sampling for training-data pipelines.

Spark's native ``DataFrame.sample`` is seeded per-partition, so its output
changes with partitioning, cluster size, and input order — useless for a
reproducible training mix at 100 TB, where the sample must be a pure
function of the data. Both operators here key the decision on
``md5(salt || key)``: re-running on any cluster layout (or in another
engine — the driver oracle recomputes them in DuckDB) selects exactly the
same rows.

- :func:`hash_sample`: Bernoulli by hash threshold — embarrassingly
  parallel, no shuffle at all, the filter runs inside the scan's codegen
  stage.
- :func:`stratified_sample`: exactly-n-per-stratum by hash order — one
  shuffle keyed on the stratum (window row_number), the standard shape for
  balanced language/source mixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_u32(key_col: str, salt: str):
    """First 32 bits of md5(salt:key) as a long in [0, 2^32)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"),
                                   F.col(key_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long")


def hash_sample(docs: DataFrame, fraction: float, key_col: str = "doc_id",
                salt: str = "ws1") -> DataFrame:
    """Keep each row iff md5(salt:key) < fraction — a deterministic
    Bernoulli sample, reproducible regardless of partitioning or cluster
    size (unlike ``DataFrame.sample``). Pure filter: no shuffle, stays in
    whole-stage codegen."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * (1 << 32))
    return docs.where(_hash_u32(key_col, salt) < F.lit(threshold))


def stratified_sample(docs: DataFrame, by: str, n_per_group: int,
                      key_col: str = "doc_id",
                      salt: str = "ws1") -> DataFrame:
    """Exactly min(n, |stratum|) rows per ``by``-group, chosen in
    md5(salt:key) order (ties -> key asc): the balanced-mix sampler
    (n docs per language / per source). One shuffle keyed on the stratum;
    deterministic for a given (salt, data)."""
    if n_per_group < 0:
        raise ValueError(f"n_per_group must be >= 0, got {n_per_group}")
    w = Window.partitionBy(by).orderBy(
        _hash_u32(key_col, salt).asc(), F.col(key_col).asc())
    return (docs.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= n_per_group).drop("_rn"))


def proportional_sample(docs: DataFrame, by: str, total_n: int,
                        key_col: str = "doc_id",
                        salt: str = "ws1") -> DataFrame:
    """Exactly ``total_n`` rows, split across ``by``-strata in proportion
    to stratum size by the largest-remainder method (quota_i =
    floor(total_n * n_i / N), the leftover seats going to the largest
    fractional parts, ties by stratum ascending), each stratum filled in
    md5(salt:key) order — the proportional training-mix sampler, fully
    deterministic for a given (salt, data).

    Plan: one stratum-count aggregation (tiny output), quota arithmetic in
    windows over the stratum frame, one broadcast-friendly join back, one
    stratum-keyed window for the per-stratum fill. total_n must not exceed
    the corpus size (every quota is then <= its stratum size by
    construction: raw_i <= n_i, and a +1 seat only lands on strata with a
    nonzero fractional part, where floor(raw) < raw <= n).
    """
    sizes = docs.groupBy(by).agg(F.count(F.lit(1)).alias("_n"))
    w_all = Window.partitionBy()
    raw = F.lit(int(total_n)) * F.col("_n") / F.sum("_n").over(w_all)
    q = (sizes.select(by, "_n", raw.alias("_raw"))
         .withColumn("_base", F.floor("_raw").cast("long"))
         .withColumn("_frac", F.col("_raw") - F.col("_base")))
    # guard AFTER the aggregation plan is built but BEFORE any action on
    # docs is wasted: one tiny count
    n_total = q.agg(F.sum("_n")).collect()[0][0] or 0
    if total_n > n_total:
        raise ValueError(
            f"total_n={total_n} exceeds corpus size {n_total}")
    rem = F.lit(int(total_n)) - F.sum("_base").over(w_all)
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("_frac"), F.asc(by)))
    quotas = q.select(
        by,
        (F.col("_base")
         + F.when(rank <= rem, F.lit(1)).otherwise(F.lit(0))).alias("_quota"))
    w_fill = Window.partitionBy(by).orderBy(
        _hash_u32(key_col, salt).asc(), F.col(key_col).asc())
    return (docs.join(quotas, by)
            .withColumn("_rn", F.row_number().over(w_fill))
            .where(F.col("_rn") <= F.col("_quota"))
            .drop("_rn", "_quota"))


def temperature_mixture(docs: DataFrame, by: str, total_n: int,
                        alpha: float = 0.5, key_col: str = "doc_id",
                        salt: str = "ws1") -> DataFrame:
    """Temperature-scaled mixture sampling — the multilingual rebalance
    rule of mC4 / XLM-R (Raffel 2020 §3.4.3, Conneau 2020 §3): stratum i
    is targeted at ``total_n * n_i^alpha / sum(n_j^alpha)`` rows, alpha
    in (0, 1] flattening the size distribution toward uniform so
    low-resource strata are up-weighted. Returns exactly ``total_n``
    rows with an ``epoch`` column (0-based copy index): a stratum whose
    target exceeds its size is repeated by whole deterministic epochs
    plus an md5-ordered partial epoch — sampling WITH replacement, the
    published practice for up-weighted languages; a down-weighted
    stratum is filled md5-first like :func:`proportional_sample`.

    Fully deterministic for (salt, data): targets are integerized by the
    same largest-remainder method as proportional_sample (fractions
    ranked descending, ties stratum-ascending). Plan shape: one tiny
    stratum-count agg + quota windows over the stratum frame, one join
    back, one stratum-keyed window, one doc-local epoch explode — the
    same bounded-shuffle story at 100 TB.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    sizes = docs.groupBy(by).agg(F.count(F.lit(1)).alias("_n"))
    share = F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
    w_all = Window.partitionBy()
    s = sizes.withColumn("_s", share)
    raw = F.lit(int(total_n)) * F.col("_s") / F.sum("_s").over(w_all)
    q = (s.select(by, "_n", raw.alias("_raw"))
         .withColumn("_base", F.floor("_raw").cast("long"))
         .withColumn("_frac", F.col("_raw") - F.col("_base")))
    rem = F.lit(int(total_n)) - F.sum("_base").over(w_all)
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("_frac"), F.asc(by)))
    quotas = q.select(
        by, "_n",
        (F.col("_base")
         + F.when(rank <= rem, F.lit(1)).otherwise(F.lit(0))).alias("_t"))
    w_fill = Window.partitionBy(by).orderBy(
        _hash_u32(key_col, salt).asc(), F.col(key_col).asc())
    j = (docs.join(quotas, by)
         .withColumn("_rn", F.row_number().over(w_fill)))
    # copies per doc: full epochs for everyone + one more for the first
    # (t mod n) docs in md5 order -> sum over stratum == t exactly
    copies = (F.floor(F.col("_t") / F.col("_n")).cast("long")
              + F.when(F.col("_rn") <= F.col("_t") % F.col("_n"),
                       F.lit(1)).otherwise(F.lit(0)))
    return (
        j.withColumn("_c", copies)
        .where(F.col("_c") > 0)
        .withColumn("epoch", F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("_c") - 1)))
        .drop("_n", "_t", "_rn", "_c")
    )


def weighted_hash_sample(docs: DataFrame, weight_col: str, rate: float,
                         key_col: str = "doc_id",
                         salt: str = "ws1") -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sample: keep a row iff
    md5(salt:key) / 2^32 < min(1, rate * weight) — each row's keep
    probability is proportional to its weight (capped at 1), so e.g.
    ``weight_col="quality"`` upweights high-quality docs in a training
    mix (temperature sampling: pass quality**tau as the column).

    Same determinism contract as :func:`hash_sample` (pure function of
    salt+key+weight, invariant to partitioning and cluster size) and the
    same plan shape: a single filter in whole-stage codegen, no shuffle.
    """
    if rate < 0:
        raise ValueError(f"rate must be >= 0, got {rate}")
    p = F.least(F.lit(1.0), F.lit(float(rate)) * F.col(weight_col))
    return docs.where(
        _hash_u32(key_col, salt).cast("double") < p * F.lit(float(1 << 32)))


def token_budget_sample(docs: DataFrame, budgets: dict, by: str = "lang",
                        text_col: str = "text", id_col: str = "doc_id",
                        salt: str = "ws1") -> DataFrame:
    """Execute a training-mix plan in TOKENS rather than rows: per
    ``by``-stratum, keep the longest md5(salt:key)-ordered prefix of docs
    whose cumulative word-token count stays within that stratum's budget
    (``budgets`` maps stratum value -> max tokens; strata absent from the
    map get budget 0, i.e. are dropped — pass them explicitly). The
    natural downstream of mixture_report: report shares -> plan budgets ->
    this op materializes the mix deterministically.

    Output: input columns + (_tokens, _cum_tokens) for audit.

    Plan shape: token counts are a scan-stage column expression; the
    selection is ONE stratum-keyed window cumsum (parallel across strata,
    same shape as conversation truncation). A pathologically dominant
    stratum serializes its own cumsum window — pre-thin with hash_sample
    (rate = budget / stratum_tokens * safety) first if one stratum is
    most of a 100 TB corpus, then the window runs over the thinned
    remainder.
    """
    if any(int(v) < 0 for v in budgets.values()):
        raise ValueError("budgets must be >= 0")
    toks = F.size(F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)).cast("long")
    budget_map = F.create_map(*[
        x for k, v in sorted(budgets.items())
        for x in (F.lit(k), F.lit(int(v)))
    ])
    w = Window.partitionBy(by).orderBy(
        _hash_u32(id_col, salt).asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_tokens", toks)
        .withColumn("_cum_tokens", F.sum("_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .where(F.col("_cum_tokens")
               <= F.coalesce(budget_map[F.col(by)], F.lit(0)))
    )


def shard_shuffle(docs: DataFrame, n_shards: int,
                  key_col: str = "doc_id",
                  salt: str = "shuf") -> DataFrame:
    """Deterministic global training-order shuffle into ``n_shards``
    output shards: every row gets a ``shard`` in [0, n_shards) and a
    0-based ``pos`` within its shard, both pure functions of
    md5(salt:key) — the "shuffle the tokenized corpus before writing
    training shards" stage, reproducible under any partitioning or
    cluster size (a seeded ``orderBy(rand())`` is neither).

    Ties in the 32-bit hash break on the raw key so the order is total.
    Scale shape: ONE shuffle keyed on ``shard`` (the window partition),
    then a per-shard external sort — exactly the work a shard writer
    does anyway (repartition + sortWithinPartitions), with ``pos`` as
    the materialized rank. Each shard holds |corpus|/n_shards rows;
    pick n_shards so that stays executor-sized at the target scale."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _hash_u32(key_col, salt)
    win = (Window.partitionBy("shard")
           .orderBy(F.col("_h").asc(), F.col(key_col).asc()))
    return (
        docs.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", (F.row_number().over(win) - 1).cast("long"))
        .drop("_h")
    )


def upsample_repeat(docs: DataFrame, weight_col: str,
                    key_col: str = "doc_id",
                    salt: str = "rep") -> DataFrame:
    """Materialize a training-mix up-sampling plan: each row repeats
    ``floor(w)`` times plus one more with probability ``frac(w)``, the
    fractional part decided by the deterministic md5 coin (so expected
    copies == w exactly, reproducible under any partitioning/cluster
    size). Adds ``copy_idx`` (0-based) — the epoch-repetition step that
    turns mixture weights > 1 (e.g. from ``mixture_report`` planning)
    into an actual materialized epoch stream; w <= 0 drops the row.
    A doc-local 1->N explode: NO shuffle, scan-speed at 100 TB."""
    w = F.col(weight_col).cast("double")
    frac = w - F.floor(w)
    extra = (_hash_u32(key_col, salt).cast("double") / F.lit(float(1 << 32))
             < frac).cast("long")
    n_copies = (F.floor(w).cast("long") + extra).alias("_n")
    out = docs.withColumn("_n", n_copies).where(F.col("_n") > 0)
    return (
        out.withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0),
                                             (F.col("_n") - 1).cast("int")))
        )
        .drop("_n")
    )

"""Salted-join/agg equivalence: results must equal the unsalted plans
on a deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from cheetah_spark.functions.skew import salted_agg, salted_join


def _skewed(spark, n=20_000):
    # ~90% of rows share key 0 — the shape AQE partition-splitting
    # alone can't rebalance for a single-key group
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = big.join(small, ["k"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_join(big, small, ["k"], buckets=8, salt_on="v").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.range(3).select(F.col("id").alias("k"), F.lit("m").alias("w"))
    plain = big.join(small, ["k"], "left")
    salted = salted_join(big, small, ["k"], how="left", buckets=8, salt_on="v")
    assert plain.count() == salted.count()
    assert (
        plain.where("w IS NULL").count() == salted.where("w IS NULL").count()
    )


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.countDistinct("v").alias("d")
    )
    salted = salted_agg(
        df,
        ["k"],
        partial_aggs=[
            F.count("*").alias("pn"),
            F.sum("v").alias("ps"),
            F.countDistinct("v").alias("pd"),
        ],
        final_aggs=[
            F.sum("pn").alias("n"),
            F.sum("ps").alias("s"),
            F.sum("pd").alias("d"),  # distinct v values never share salt (salt_on=v)
        ],
        buckets=8,
        salt_on="v",
    )
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def _set_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore_confs(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


_AQE_PROBE_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # the 100TB-vocab regime
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2kb",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2kb",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.shuffle.partitions": "16",
}


def _planted_tf(spark, n=400_000):
    """Token table with one ~100x hot token ('the': 99% of rows)."""
    return spark.range(0, n, 1, 8).select(
        (F.col("id") % 1000).alias("doc_id"),
        F.when(F.col("id") % 100 < 99, "the")
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 3000).cast("string")))
        .alias("term"),
    )


def test_aqe_skew_join_blocked_by_aggregate_side(spark):
    """Pins the MEASURED Spark limitation the token-join docstrings
    rest on: OptimizeSkewedJoin splits a skewed SMJ only when both
    Sort children sit directly on shuffle stages. With an aggregate
    feeding the dim side (the tf⋈df shape), the split never engages —
    even with forceOptimizeSkewedJoin and thresholds far below the
    planted skew — which is WHY hot_salted_join exists. If a future
    Spark lifts this, this test flags that the pre-salting can go."""
    old = _set_confs(spark, _AQE_PROBE_CONFS)
    try:
        tf = _planted_tf(spark)
        # control: bare-shuffle sides -> AQE skew split engages
        right = spark.range(0, 3000, 1, 8).select(
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("term"),
            F.col("id").alias("w"),
        ).union(spark.range(1).select(F.lit("the"), F.lit(-1)))
        ctl = tf.join(right, "term")
        assert ctl.count() > 0  # separate QE; executes the join
        ctl.collect()
        ctl_plan = ctl._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in ctl_plan, "control: AQE skew split should engage"

        # same join, dim side aggregate-fed -> AQE cannot split
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        j = tf.join(dfreq, "term")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "skew=true" not in plan, (
            "AQE now splits aggregate-fed skew joins — hot_salted_join "
            "pre-salting in tfidf/unigram_logprob may be removable"
        )
    finally:
        _restore_confs(spark, old)


def test_hot_salted_join_matches_plain_and_spreads_hot_key(spark):
    """hot_salted_join on a planted 100x-skewed token: results are
    identical to the plain join, the join shuffle is keyed on
    (term, __salt), and the hot token's rows actually spread across
    multiple salt buckets (the q_skew_salted_agg-style proof that the
    mitigation ENGAGES, not just exists)."""
    from cheetah_spark.functions.skew import SALT_COL, hot_salted_join

    tf = _planted_tf(spark, n=100_000)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    plain = tf.join(dfreq, "term").groupBy("term").agg(
        F.count("*").alias("n"), F.sum("df").alias("sd")
    )
    salted = hot_salted_join(
        tf, dfreq, "term", freq_col="df", salt_on="doc_id", hot_k=4, buckets=8
    ).groupBy("term").agg(F.count("*").alias("n"), F.sum("df").alias("sd"))
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))

    # In the 100TB-vocab regime (dim too big to broadcast) the join
    # shuffle must be keyed on (term, __salt); at fixture scale Spark
    # rightly broadcasts instead, so pin the shape with broadcast off.
    old = _set_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"})
    try:
        sj = hot_salted_join(
            tf, dfreq, "term", freq_col="df", salt_on="doc_id", hot_k=4, buckets=8
        )
        plan = sj._jdf.queryExecution().executedPlan().toString()
        import re

        assert re.search(r"hashpartitioning\(term#\d+L?, __salt", plan), plan
    finally:
        _restore_confs(spark, old)

    # the hot token really lands in >1 bucket
    from pyspark.sql import functions as FF

    big_s = tf.withColumn(
        SALT_COL, FF.pmod(FF.xxhash64(FF.col("doc_id")), FF.lit(8)).cast("int")
    )
    n_buckets = (
        big_s.where(FF.col("term") == "the").select(SALT_COL).distinct().count()
    )
    assert n_buckets > 1


def test_hot_salted_join_broadcast_tags_large_hot_head(spark):
    """Round-6 verdict item #5: for hot_k > _HOT_ISIN_MAX the hot head
    must be tagged via a BroadcastHashJoin against a K-row hot-key
    relation, NOT an isin literal list baked into both sides' codegen
    — and results must still match the plain join exactly."""
    import re

    from cheetah_spark.functions.skew import _HOT_ISIN_MAX, hot_salted_join

    tf = _planted_tf(spark, n=100_000)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    hot_k = _HOT_ISIN_MAX + 36  # forces the broadcast-tag path

    plain = tf.join(dfreq, "term").groupBy("term").agg(
        F.count("*").alias("n"), F.sum("df").alias("sd")
    )
    sj = hot_salted_join(
        tf, dfreq, "term", freq_col="df", salt_on="doc_id", hot_k=hot_k, buckets=8
    )
    salted = sj.groupBy("term").agg(F.count("*").alias("n"), F.sum("df").alias("sd"))
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))

    plan = sj._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # no 100-literal In list on the join key anywhere in the plan
    in_lists = re.findall(r"term#\d+L? IN \(([^)]*)\)", plan) + re.findall(
        r"term#\d+L? INSET ([^)\n]*)", plan
    )
    for lst in in_lists:
        assert lst.count(",") < _HOT_ISIN_MAX, (
            "hot head leaked into codegen as literals:\n" + plan
        )

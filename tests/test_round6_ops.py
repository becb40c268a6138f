"""Round-6 operator tests: ranking_metrics (recall@k / MRR@k readout)."""

from pyspark.sql import functions as F


def _frames(spark):
    # two queries: q1 with 3 gold docs, q2 with 1 gold doc that the
    # ranked list misses entirely
    ranked = spark.createDataFrame(
        [
            ("q1", "d1", 1),
            ("q1", "dX", 2),
            ("q1", "d3", 3),
            ("q1", "dY", 4),
            ("q2", "dZ", 1),
            ("q2", "dW", 2),
        ],
        "qid string, cid string, rank bigint",
    )
    gold = spark.createDataFrame(
        [("q1", "d1"), ("q1", "d2"), ("q1", "d3"), ("q2", "d9")],
        "qid string, cid string",
    )
    return ranked, gold


def test_ranking_metrics_hits_recall_mrr(spark):
    from etl_wrap_spark.operators.retrieval import ranking_metrics

    ranked, gold = _frames(spark)
    rows = {
        r.qid: r
        for r in ranking_metrics(ranked, gold, "qid", "cid", "rank", k=4).collect()
    }
    q1 = rows["q1"]
    assert q1.n_gold == 3 and q1.hits_at_k == 2
    # recall = floor(10000 * 2 / min(3, 4)) = 6666; first gold at rank 1
    assert q1.recall_at_k_bp == 6666 and q1.mrr_fp == 1_000_000
    # DCG_fp = d[1] + d[3] = 1000000 + 500000; IDCG_fp = d[1]+d[2]+d[3]
    # (prefix at min(3, 4)) = 2130929 -> floor(10000*1500000/2130929)
    assert q1.ndcg_bp == 7039
    q2 = rows["q2"]
    assert q2.n_gold == 1 and q2.hits_at_k == 0
    assert q2.recall_at_k_bp == 0 and q2.mrr_fp == 0 and q2.ndcg_bp == 0


def test_ranking_metrics_k_truncation_and_cap(spark):
    from etl_wrap_spark.operators.retrieval import ranking_metrics

    ranked, gold = _frames(spark)
    # k=2 truncates q1's list to ranks 1-2: one hit (d1); gold capped at
    # min(n_gold, k) = 2 → recall = 5000; first hit at rank 1
    rows = {
        r.qid: r
        for r in ranking_metrics(ranked, gold, "qid", "cid", "rank", k=2).collect()
    }
    q1 = rows["q1"]
    assert q1.hits_at_k == 1 and q1.recall_at_k_bp == 5000
    # DCG_fp = d[1]; IDCG_fp = prefix at min(3, 2) = 1630929
    assert q1.ndcg_bp == 6131
    # mrr reciprocal of a later first-hit rank floors exactly
    ranked2 = ranked.withColumn(
        "rank", F.when(F.col("cid") == "d1", 3).otherwise(F.col("rank"))
    )
    rows2 = {
        r.qid: r
        for r in ranking_metrics(ranked2, gold, "qid", "cid", "rank", k=4).collect()
    }
    assert rows2["q1"].mrr_fp == 1_000_000 // 3  # 333333

"""Multinomial Naive Bayes text classifier — the classic quality/domain
filter of LLM data pipelines (the fastText-style seed-classifier pattern:
train a cheap linear model on labeled seed data, score the whole corpus,
keep the high-scoring tail; cf. DCLM / CCNet quality filtering).

Here the label is the document's ``lang`` column and the split is
deterministic (``doc_id % 5``: fold 0 is the held-out test set), so the
whole train → score → predict flow is exactly reproducible and every stage
has a DuckDB oracle.

Scale design (100 TB corpus, 1000 executors):

* Training state is three aggregates over the train split: per-(class,
  term) counts (vocab×classes rows — a token-keyed hash-agg), per-class
  token totals (|classes| rows) and doc priors (|classes| rows), and the
  vocabulary size (1 scalar).  Class-level frames are broadcast; the
  (class, term) likelihood table is NOT broadcast — at web scale the vocab
  outgrows any broadcast budget, so scoring joins it on the term key
  (shuffle join, linear).
* Scoring is: per-(doc, term) tf → cross join the |classes|-row broadcast →
  LEFT join the likelihood table on (term, class) with add-1 smoothing for
  unseen terms → one (doc, class) hash-agg → per-doc argmax via a
  5-row-per-doc window (partitioned by doc_id — no single-partition
  window).
* No driver collects, no Python kernels: the entire flow is Catalyst
  expressions.

Determinism: argmax ties break on class ASC; log-likelihoods are rounded
only for display (argmax runs on full doubles; class score gaps are O(1)
while cross-engine float noise is O(1e-12), so the argmax is stable — same
argument as the lang_id stopword argmax).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, *extra_cols: str) -> DataFrame:
    return (
        docs.select(*extra_cols, F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
    )


def nb_predictions(docs: DataFrame, n_folds: int = 5) -> DataFrame:
    """(doc_id, pred_lang, true_lang, correct, score) for every held-out
    document (fold 0 of the deterministic ``doc_id % n_folds`` split)."""
    is_test = F.col("doc_id") % n_folds == 0
    train_docs = docs.where(~is_test)
    test_docs = docs.where(is_test)

    train_tok = _tokens(train_docs, "doc_id", "lang")
    # per-(class, term) counts: token-keyed hash-agg, the model's only
    # vocab-sized state
    cnt = train_tok.groupBy("lang", "term").agg(F.count("*").alias("c"))
    # class token totals + doc priors: |classes| rows — broadcast
    cls = F.broadcast(
        train_tok.groupBy("lang").agg(F.count("*").alias("total"))
    )
    prior = F.broadcast(
        train_docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    )
    n_train = F.broadcast(train_docs.agg(F.count("*").alias("n_train")))
    vocab = F.broadcast(
        train_tok.select("term").distinct().agg(F.count("*").alias("v"))
    )

    test_tf = (
        _tokens(test_docs, "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        test_tf.crossJoin(cls)
        .crossJoin(vocab)
        .join(cnt, ["term", "lang"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.col("tf")
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                    / (F.col("total") + F.col("v"))
                )
            ).alias("loglik")
        )
        .join(prior, "lang")
        .crossJoin(n_train)
        .withColumn(
            "score",
            F.col("loglik") + F.log(F.col("n_docs") / F.col("n_train").cast("double")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "score")
    )
    return (
        pred.join(docs.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
        .select(
            "doc_id",
            "pred_lang",
            "true_lang",
            (F.col("pred_lang") == F.col("true_lang")).alias("correct"),
            F.round("score", 6).alias("score"),
        )
    )


def nb_confusion(docs: DataFrame, n_folds: int = 5) -> DataFrame:
    """Confusion matrix (true_lang, pred_lang, n) over the held-out fold —
    the model-quality readout next to ``lang_id_confusion``'s heuristic."""
    return (
        nb_predictions(docs, n_folds)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


def nb_predictions_sql(n_folds: int = 5) -> str:
    """DuckDB oracle for nb_predictions (same math, same tie order)."""
    return f"""
    WITH tokl AS (
      SELECT doc_id, lang, term FROM (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents) WHERE term <> ''),
    train_tok AS (SELECT * FROM tokl WHERE doc_id % {n_folds} <> 0),
    cnt AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
            FROM train_tok GROUP BY 1, 2),
    cls AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS total
            FROM train_tok GROUP BY lang),
    prior AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM documents WHERE doc_id % {n_folds} <> 0 GROUP BY lang),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train
           FROM documents WHERE doc_id % {n_folds} <> 0),
    vocab AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM train_tok),
    test_tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM tokl WHERE doc_id % {n_folds} = 0 GROUP BY 1, 2),
    scored AS (
      SELECT t.doc_id, cl.lang,
             SUM(t.tf * ln((COALESCE(cnt.c, 0) + 1.0) / (cl.total + vocab.v)))
               AS loglik
      FROM test_tf t CROSS JOIN cls cl CROSS JOIN vocab
      LEFT JOIN cnt ON cnt.lang = cl.lang AND cnt.term = t.term
      GROUP BY 1, 2),
    withprior AS (
      SELECT s.doc_id, s.lang,
             s.loglik + ln(CAST(p.n_docs AS DOUBLE) / nt.n_train) AS score
      FROM scored s JOIN prior p USING (lang) CROSS JOIN nt),
    pred AS (
      SELECT doc_id, lang, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang ASC) AS rn
      FROM withprior)
    SELECT p.doc_id, p.lang AS pred_lang, d.lang AS true_lang,
           p.lang = d.lang AS correct, round(p.score, 6) AS score
    FROM pred p JOIN documents d USING (doc_id) WHERE rn = 1
    """


def nb_confusion_sql(n_folds: int = 5) -> str:
    return f"""
    WITH base AS ({nb_predictions_sql(n_folds)})
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM base GROUP BY 1, 2
    """

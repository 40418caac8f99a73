"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The LLM-pipeline step that sizes every other one: learn the byte-pair
merge table from the corpus, then tokenize with it.  The classic
algorithm trains on the WORD-FREQUENCY table, not the raw text — and
that is exactly the shape that scales: the corpus is scanned ONCE into
``(word, freq)`` (one shuffle on a vocabulary-bounded key space, with
map-side partial aggregation), and every merge round afterwards touches
only that table.  At web scale the word table is ~10^8-10^9 rows where
the corpus is 10^12 — three orders of magnitude less data in the loop.

Merge rounds are pure DataFrame ops:

* pair counts — a codegen ``transform(sequence(...))`` enumerates the
  adjacent symbol pairs of each word (weighted by word freq, overlapping
  occurrences counted like the reference implementation), one partially
  aggregated groupBy;
* the winning pair — ``orderBy(count desc, pair asc).limit(1)`` (a
  TakeOrdered, not a full sort; the lexicographic tie-break makes
  training deterministic where Sennrich's dict-order ``max`` is not);
* the rewrite — a JVM ``aggregate`` (fold) over each word's symbol
  array replaces left-to-right non-overlapping ``(p1, p2)`` with the
  merged symbol: no UDF, no Python, no shuffle (the word table keeps
  its partitioning across rounds).

Lineage is truncated with ``localCheckpoint`` every few rounds so the
plan does not grow linearly in ``num_merges``.

Training has no closed-form SQL (per-round data-dependent argmax), so
the registry gates it rows-only; correctness is a pytest differential
against an independent pure-Python reference of the published algorithm
(identical merge sequence AND identical encodings).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"
_CHECKPOINT_EVERY = 8


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> (word, freq, syms) with syms = chars + END."""
    w = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    chars = F.expr("filter(split(word, ''), s -> s <> '')")
    return (
        docs.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn("syms", F.concat(chars, F.array(F.lit(END))))
    )


def _apply_merge(syms: Column, p1: str, p2: str) -> Column:
    """Replace left-to-right non-overlapping (p1, p2) runs with p1+p2 —
    a JVM fold carrying the one unflushed symbol (``pend``); symbols are
    never empty strings so NULL is a safe no-pending sentinel."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        take = acc.pend.isNotNull() & (acc.pend == F.lit(p1)) & (s == F.lit(p2))
        out2 = (
            F.when(take, F.concat(acc.out, F.array(F.lit(p1 + p2))))
            .when(acc.pend.isNull(), acc.out)
            .otherwise(F.concat(acc.out, F.array(acc.pend)))
        )
        pend2 = F.when(take, F.lit(None).cast("string")).otherwise(s)
        return F.struct(out2.alias("out"), pend2.alias("pend"))

    def fin(acc):
        return F.when(acc.pend.isNull(), acc.out).otherwise(
            F.concat(acc.out, F.array(acc.pend))
        )

    return F.aggregate(syms, init, step, fin)


def _pairs_expr() -> Column:
    # built lazily: this module is also imported inside Python workers
    # (the tokenize UDF), where no SparkContext exists
    return F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(syms[i-1] AS p1, syms[i] AS p2))"
    )


def bpe_train(
    docs: DataFrame, num_merges: int = 48, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Learn the merge table: ``[(rank, p1, p2, weighted_pair_count)]``.

    The returned list is driver-side by design — it IS the tokenizer
    artifact (bounded by ``num_merges``), the analog of a vocab file."""
    wf = word_freq_table(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best = (
            wf.filter(F.size("syms") >= 2)
            .select("freq", F.explode(_pairs_expr()).alias("pr"))
            .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "p1", "p2")
            .limit(1)
            .collect()
        )
        if not best:
            break
        p1, p2, c = best[0]["p1"], best[0]["p2"], int(best[0]["c"])
        merges.append((rank, p1, p2, c))
        wf = wf.withColumn("syms", _apply_merge(F.col("syms"), p1, p2))
        if (rank + 1) % _CHECKPOINT_EVERY == 0:
            wf = wf.localCheckpoint()
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference encode loop: repeatedly merge the lowest-rank adjacent
    pair (the published greedy BPE encoder)."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        pairs = [(ranks.get((a, b), None), i) for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        r, _ = min(ranked)
        p = min(i for rr, i in ranked if rr == r)  # leftmost of the best rank
        # merge ALL non-overlapping occurrences of this pair, left to right
        a, b = syms[p], syms[p + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge table: (doc_id, n_tokens_bpe,
    n_words).  Arrow-batched pandas UDF (the encode loop is inherently
    sequential per word) with a per-batch word cache — real corpora are
    Zipfian, so the cache collapses the work to unique words per batch;
    the merge table ships in the closure (tokenizer artifacts are KBs).
    """
    ranks = {(p1, p2): r for r, p1, p2, _ in merges}

    @F.pandas_udf("long")
    def n_bpe(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def count(t: str) -> int:
            total = 0
            for w in t.strip().split():
                if w not in cache:
                    cache[w] = len(encode_word(w, ranks))
                total += cache[w]
            return total

        return texts.map(count)

    from fagi_gis_spark.functions.text import token_count

    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_bpe(F.col(text_col)).alias("n_tokens_bpe"),
        token_count(F.col(text_col)).alias("n_words"),
    )

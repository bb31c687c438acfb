"""Distributed n-gram language-model scoring (Stupid Backoff).

CCNet filters web text by language-model perplexity; training and
applying an LM over a 100 TB corpus is itself a distributed problem.
Stupid Backoff (Brants et al. 2007, "Large Language Models in Machine
Translation") is the n-gram smoothing DESIGNED for map-reduce: no
normalized discounting state, every score is a pure function of raw
count tables —

    S(w | c) = count(c·w) / count(c)            if count(c·w) > 0
             = alpha · S(w | shorter c)          otherwise
    S(w)     = count(w) / N                      (unigram base)

so training is ONE groupBy per order and scoring is LEFT JOINs against
the count tables — no driver-side model object, the LM itself stays a
DataFrame and scales with the cluster.  (The score is not a normalized
probability; Brants et al. show it tracks perplexity rankings at a
fraction of the cost, which is exactly what a corpus quality gate
needs.)

Tokenization matches the rest of the repo (Java ``\\s`` ASCII split,
lowercased) with control-char BOS/EOS boundary markers (see the
``_BOS`` comment — printable markers like ``<s>`` collide with real
web-text tokens); grams are
space-joined token strings, so every table is human-auditable and a
pure-Python oracle reproduces scores exactly (tests).

Plan shape: train = one token-scale explode + one partial-aggregated
groupBy per order (uniform string keys).  Scoring = one explode into
(position, context) rows + ``order`` LEFT JOINs (each on a gram
string) + one per-doc aggregate.  Count tables above ``min_count`` are
typically vocabulary-scale; pass ``broadcast_lm=True`` when they fit
on executors to collapse the joins into map-side lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_ngram_lm", "score_lm", "perplexity_filter", "ALPHA"]

#: Stupid Backoff's published back-off multiplier.
ALPHA = 0.4

# Sentence markers are CONTROL characters, not printable strings like
# '<s>': a literal whitespace-delimited '<s>' token (the HTML
# strikethrough tag, common in web text) would otherwise merge with
# the marker rows — count('<s>') then includes (order-1) markers per
# document while N excludes them, so a doc containing the literal tag
# could score S > 1 and deflate its pseudo-perplexity past the gate.
# Literal marker tokens in text (vanishingly rare — a bare \x02/\x03
# between whitespace) are escaped with \x1b so they can never equal a
# marker; the escape is single-level, consistently applied at train
# AND score time (an adversarial literal '\x1b\x02' token aliasing an
# escaped '\x02' is the accepted residual).
_BOS = "\x02"
_EOS = "\x03"
_ESC = "\x1b"


def _tokens(text_col: str):
    from .textstats import ws_tokens

    toks = ws_tokens(F.col(text_col))
    return F.transform(
        toks,
        lambda t: F.when(
            (t == _BOS) | (t == _EOS), F.concat(F.lit(_ESC), t)
        ).otherwise(t),
    )


def _marked(text_col: str, order: int):
    """Token array with (order-1) BOS markers and one EOS marker."""
    bos = F.array(*[F.lit(_BOS)] * (order - 1))
    return F.concat(bos, _tokens(text_col), F.array(F.lit(_EOS)))


def train_ngram_lm(
    df: DataFrame,
    text_col: str = "text",
    order: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Count tables for all orders 1..``order`` in ONE frame:
    ``(n, gram, cnt)``.  ``min_count`` prunes rare grams (they fall
    back to shorter contexts at score time — the standard entropy/size
    trade); unigrams are never pruned (they are the base case).
    The unigram total N rides along as the reserved gram ``''`` with
    n = 0 — the whole LM stays one self-contained DataFrame that
    ``write.parquet`` persists."""
    if order < 1:
        raise ValueError("order must be ≥ 1")
    staged = df.select(_marked(text_col, order).alias("_mt"))
    # ONE tagged explode for every order (one corpus SCAN — the
    # per-order loop form scanned the corpus `order` times; locally
    # over a cached input that is only 143 s → 136 s because the gram
    # shuffle dominates, but at 100 TB the input scans are the cost
    # that multiplies) and ONE groupBy on (n, gram)
    tagged = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(order)),
            lambda n: F.transform(
                # grams of order n, inlined so n (a lambda var) is legal
                F.when(
                    F.size("_mt") >= n,
                    F.sequence(F.lit(0), F.size("_mt") - n),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.struct(
                    n.alias("n"),
                    F.concat_ws(" ", F.slice("_mt", i + 1, n)).alias("gram"),
                ),
            ),
        )
    )
    counts = (
        staged.select(F.explode(tagged).alias("_g"))
        .groupBy(F.col("_g.n").alias("n"), F.col("_g.gram").alias("gram"))
        .agg(F.count("*").alias("cnt"))
    )
    if min_count > 1:
        counts = counts.filter(
            (F.col("n") == 1) | (F.col("cnt") >= min_count)
        )
    # N = total non-BOS unigram mass (BOS is context-only, never
    # scored) = Σ_docs (tokens + 1) — computed ARITHMETICALLY from doc
    # lengths, not from the count table: hanging it off the groupBy
    # lineage made the union consume the 310M-row explode+shuffle
    # TWICE (measured 174 s vs 136 s for the same output)
    total = staged.agg(
        F.sum(F.size("_mt") - (order - 1)).alias("cnt")
    ).select(F.lit(0).alias("n"), F.lit("").alias("gram"), "cnt")
    return counts.select("n", "gram", "cnt").unionByName(total)


def score_lm(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 3,
    alpha: float = ALPHA,
    broadcast_lm: bool = False,
) -> DataFrame:
    """Per-document Stupid Backoff score: ``(id, n_scored,
    logscore_per_token, pseudo_ppl)`` where ``logscore_per_token`` is
    mean ln S(w|context) over all non-BOS positions (EOS included) and
    ``pseudo_ppl = exp(-logscore_per_token)`` — lower is more
    in-domain.  Unknown words score via the unigram floor
    ``alpha^(order-1) · 1/N`` (never -inf, so one OOV token cannot veto
    a document).

    One explode into scoring positions, ``order`` LEFT JOINs against
    the count frame (hint-broadcast with ``broadcast_lm=True`` when
    the pruned LM fits on executors), one per-doc aggregate."""
    if order < 1:
        raise ValueError("order must be ≥ 1")
    # per-order gram lookup tables, renamed per join role. NOTE the
    # backoff needs TWO different (n-1)-scale lookups per position: the
    # SUFFIX (n-1)-gram (the next backoff level's numerator gram) and
    # the PREFIX context (count(c) in count(c·w)/count(c)) — they are
    # different keys, so scoring joins 2·order-1 tables.
    def _tbl(n: int, key: str, cnt: str):
        t = lm.filter(F.col("n") == n).select(
            F.col("gram").alias(key), F.col("cnt").alias(cnt)
        )
        return F.broadcast(t) if broadcast_lm else t

    total_row = lm.filter(F.col("n") == 0)

    staged = df.select(
        F.col(id_col).alias("id"), _marked(text_col, order).alias("_mt")
    )
    # one row per scored position i (0-based over the marked array,
    # scoring token at index i+order-1): gram _g{n} = last n tokens
    # ending at the scored token; _x{n} = its (n-1)-token prefix context
    def _pos_struct(i):
        fields = []
        for n in range(1, order + 1):
            fields.append(
                F.concat_ws(" ", F.slice("_mt", i + order - n + 1, n)).alias(
                    f"_g{n}"
                )
            )
            if n >= 2:
                fields.append(
                    F.concat_ws(
                        " ", F.slice("_mt", i + order - n + 1, n - 1)
                    ).alias(f"_x{n}")
                )
        return F.struct(*fields)

    pos = staged.select(
        "id",
        F.explode(
            F.transform(F.sequence(F.lit(0), F.size("_mt") - order), _pos_struct)
        ).alias("_p"),
    ).select("id", "_p.*")

    joined = pos
    for n in range(1, order + 1):
        joined = joined.join(_tbl(n, f"_g{n}", f"_c{n}"), f"_g{n}", "left")
        if n >= 2:
            joined = joined.join(_tbl(n - 1, f"_x{n}", f"_cx{n}"), f"_x{n}", "left")
    joined = joined.crossJoin(
        F.broadcast(total_row.select(F.col("cnt").alias("_N")))
    )

    # backoff chain from the unigram base up — each level references
    # the previous ONCE (linear nesting; the accumulator-when-chain
    # pitfall needs double references to go exponential)
    s = F.when(
        F.col("_c1").isNotNull(), F.col("_c1") / F.col("_N")
    ).otherwise(F.lit(1.0) / F.col("_N"))
    for n in range(2, order + 1):
        s = F.when(
            F.col(f"_c{n}").isNotNull() & F.col(f"_cx{n}").isNotNull(),
            F.col(f"_c{n}") / F.col(f"_cx{n}"),
        ).otherwise(F.lit(alpha) * s)

    per_pos = joined.select("id", F.log(s).alias("_ls"))
    agg = per_pos.groupBy("id").agg(
        F.count("*").alias("n_scored"),
        F.avg("_ls").alias("logscore_per_token"),
    )
    return agg.select(
        "id",
        "n_scored",
        F.round("logscore_per_token", 6).alias("logscore_per_token"),
        F.round(F.exp(-F.col("logscore_per_token")), 6).alias("pseudo_ppl"),
    )


def perplexity_filter(
    df: DataFrame,
    lm: DataFrame,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 3,
    alpha: float = ALPHA,
    broadcast_lm: bool = False,
) -> DataFrame:
    """Keep only documents whose ``pseudo_ppl`` ≤ ``max_ppl`` — the
    CCNet-style LM quality gate with the LM trained on an in-domain
    seed corpus.  LEFT SEMI join on the id: the input schema passes
    through untouched."""
    keep = (
        score_lm(
            df, lm, text_col=text_col, id_col=id_col,
            order=order, alpha=alpha, broadcast_lm=broadcast_lm,
        )
        .filter(F.col("pseudo_ppl") <= max_ppl)
        .select(F.col("id").alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")

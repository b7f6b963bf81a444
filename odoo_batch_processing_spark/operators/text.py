"""Text-analysis operators (X5 + the training-data-pipeline surface).

The reference's only string functions are trim/split/toLowerCase/concat
(Odoo-Batch-Processing.user.js:128, 273-274, 297-298, 587); this module
is the driver-mandated extension (BASELINE.json north star): language
identification, quality scoring, token counting, and document
fingerprinting over the ``documents`` fixture — the per-document text
featurization pass of an LLM data pipeline.

All operators are pure built-in column expressions (JVM-side,
whole-stage codegen; zero Python UDFs), so at 100 TB the pass is a
single scan with no shuffle: every feature is computed per-row and the
only shuffles below are the explicit groupBy queries (term frequency).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from odoo_batch_processing_spark.sources.loader import fan_out, load_table

# Stopword lists for the n-gram/stopword language heuristic. Tiny by
# design: at 100 TB the lists live in a broadcast variable; here they
# fold into the plan as literals.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "de", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist", "von"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization, blanks dropped (the reference's own
    split-and-filter idiom, user.js:297-298, applied to words)."""
    return F.filter(F.split(text, " "), lambda x: F.trim(x) != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-like proxy count: word pieces of ≤4 chars — ceil(len/4)
    summed over words. Counts sub-word units the way byte-pair
    tokenizers roughly do, with zero dictionary state."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("bigint"),
    )


def stopword_hits(text: Column, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in the text."""
    stoplist = STOPWORDS[lang]
    return F.size(
        F.array_intersect(
            F.array_distinct(tokens(text)),
            F.array(*[F.lit(w) for w in stoplist]),
        )
    )


def lang_id(text: Column) -> Column:
    """Language-ID heuristic: CJK character ratio → 'zh'; otherwise the
    language whose stopword list scores the most distinct hits, ties
    broken in fixed order en > es > fr > de; no hits → 'und'."""
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    s = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] > 0), F.lit("en"))
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]) & (s["es"] > 0), F.lit("es"))
        .when((s["fr"] >= s["de"]) & (s["fr"] > 0), F.lit("fr"))
        .when(s["de"] > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features; each a single
    deterministic double (one division — bit-identical across engines)."""
    n_tok = token_count(text)
    n_char = F.length(text).cast("bigint")
    n_punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", "")).cast("bigint")
    n_stop = F.size(
        F.filter(tokens(text), lambda x: x.isin(*STOPWORDS["en"]))
    ).cast("bigint")
    # empty/blank documents: ratios are NULL by definition (guarded —
    # double 0/0 would give NaN in Spark but error paths differ across
    # engines; NULL is the portable, filterable answer)
    safe_tok = F.when(n_tok > 0, n_tok)
    safe_char = F.when(n_char > 0, n_char)
    mean_word_len = (n_char - (n_tok - 1)).cast("double") / safe_tok
    return {
        "n_chars": n_char,
        "n_tokens": n_tok,
        "punct_ratio": n_punct.cast("double") / safe_char,
        "stopword_ratio": n_stop.cast("double") / safe_tok,
        "mean_word_len": mean_word_len,
    }


def quality_score(text: Column) -> Column:
    """Linear quality score over the features — the shape of a
    Gopher/C4-style heuristic filter (public data-quality literature),
    deterministic for oracle comparison."""
    f = quality_features(text)
    return (
        F.lit(0.4) * f["stopword_ratio"]
        + F.lit(0.3) * F.least(f["n_tokens"].cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * F.least(f["mean_word_len"] / 10.0, F.lit(1.0))
    )


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of whitespace-collapsed,
    lower-cased, trimmed text — the exact-dedup key (X2)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


def rolling_hash(text: Column, modulus: int = 2**31 - 1, base: int = 31) -> Column:
    """Polynomial rolling hash over tokens (Karp–Rabin shape) — kept
    modulo a Mersenne prime so ANSI-mode bigint arithmetic can't
    overflow. Spark-only (no SQL oracle; unit-tested)."""
    return F.aggregate(
        tokens(text),
        F.lit(7).cast("bigint"),
        lambda acc, w: F.pmod(acc * base + F.xxhash64(w), F.lit(modulus)),
    )


# ---------------------------------------------------------------------------
# registry queries
# ---------------------------------------------------------------------------
def _q_x5_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    text = F.col("text")
    f = quality_features(text)
    return docs.select(
        "doc_id",
        f["n_tokens"].alias("n_tokens"),
        bpe_ish_token_count(text).alias("n_pieces"),
        f["stopword_ratio"].alias("stopword_ratio"),
        f["mean_word_len"].alias("mean_word_len"),
    )


def _q_x5_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    return docs.select("doc_id", "lang", lang_id(F.col("text")).alias("lang_pred"))


def _q_x5_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


def _q_x5_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency + document frequency, top-20 terms.
    The groupBy(token) shuffle is the classic wordcount — partial
    aggregation makes the map-side combine, so shuffle volume is
    O(vocabulary), not O(tokens)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(20)
    )


def _q_x5_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def _q_x5_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole per-document featurization pass in ONE projection:
    token stats, BPE-ish piece count, quality ratios + score, language
    prediction, and the dedup fingerprint. All codegen'd column
    expressions over one scan — at 100 TB this is the single-pass
    feature stage of the pipeline (merges the former x5_token_stats /
    x5_quality_score / x5_lang_id / x5_fingerprint entries)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    text = F.col("text")
    f = quality_features(text)
    return docs.select(
        "doc_id",
        "lang",
        f["n_tokens"].alias("n_tokens"),
        bpe_ish_token_count(text).alias("n_pieces"),
        f["stopword_ratio"].alias("stopword_ratio"),
        f["mean_word_len"].alias("mean_word_len"),
        quality_score(text).alias("quality"),
        lang_id(text).alias("lang_pred"),
        fingerprint(text).alias("fp"),
    )


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _stop_hits_sql(lang: str) -> str:
    return (
        "len(list_intersect(list_distinct(list_filter(string_split(text, ' '), "
        f"x -> trim(x) <> '')), {_sql_list(STOPWORDS[lang])}))"
    )


def _q_x5_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by a tf·idf-style score.

    Uses the RATIONAL idf (N/df) instead of log(N/df): the score is
    then (int·int)/int in doubles — bit-identical across engines,
    whereas libm log() may differ in the last ulp between the JVM and
    DuckDB. Ranking (and therefore the result set) is identical either
    way since log is monotone.

    Plan: doc-term counts (one shuffle) ⋈ df counts (one shuffle over
    the vocabulary) → per-doc top-K window. The vocabulary side is
    hint-free: it is usually threshold-broadcast, but vocabulary grows
    (sub-linearly) with the corpus, so the decision is left to the size
    estimate + AQE rather than pinned with a hint.
    """
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    doc_terms = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.count()  # scalar: fixed per sf_dir, folds into the plan
    df_counts = doc_terms.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = doc_terms.join(df_counts, "token").withColumn(
        "tfidf",
        F.col("tf").cast("double") * (F.lit(float(n_docs)) / F.col("df")),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "token", "tfidf")
    )


# Core: the merged single-pass featurization + the tf-idf shuffle
# query (which computes term/document frequency on the way). Extended:
# the standalone per-feature micro-queries.
QUERIES = {
    "x5_text_features": _q_x5_text_features,
    "x5_tfidf_top_terms": _q_x5_tfidf_top_terms,
}

QUERIES_EXT = {
    "x5_token_stats": _q_x5_token_stats,
    "x5_lang_id": _q_x5_lang_id,
    "x5_quality_score": _q_x5_quality_score,
    "x5_term_frequency": _q_x5_term_frequency,
    "x5_fingerprint": _q_x5_fingerprint,
}

_TOKS = "list_filter(string_split(text, ' '), x -> trim(x) <> '')"
_NTOK = f"CAST(len({_TOKS}) AS BIGINT)"
_NCHAR = "CAST(length(text) AS BIGINT)"
_NSTOP = (
    f"CAST(len(list_filter({_TOKS}, x -> list_contains({_sql_list(STOPWORDS['en'])}, x))) AS BIGINT)"
)
# nullif guards mirror the Spark-side empty-document NULL semantics
_MEANWL = f"CAST({_NCHAR} - ({_NTOK} - 1) AS DOUBLE) / nullif({_NTOK}, 0)"
_STOPRATIO = f"CAST({_NSTOP} AS DOUBLE) / nullif({_NTOK}, 0)"

ORACLES = {
    "x5_token_stats": f"""
        SELECT doc_id,
               {_NTOK} AS n_tokens,
               CAST(list_sum(list_transform({_TOKS}, w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_pieces,
               {_STOPRATIO} AS stopword_ratio,
               {_MEANWL} AS mean_word_len
        FROM documents
    """,
    "x5_lang_id": f"""
        SELECT doc_id, lang,
               CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'zh'
                    WHEN {_stop_hits_sql('en')} >= {_stop_hits_sql('es')}
                     AND {_stop_hits_sql('en')} >= {_stop_hits_sql('fr')}
                     AND {_stop_hits_sql('en')} >= {_stop_hits_sql('de')}
                     AND {_stop_hits_sql('en')} > 0 THEN 'en'
                    WHEN {_stop_hits_sql('es')} >= {_stop_hits_sql('fr')}
                     AND {_stop_hits_sql('es')} >= {_stop_hits_sql('de')}
                     AND {_stop_hits_sql('es')} > 0 THEN 'es'
                    WHEN {_stop_hits_sql('fr')} >= {_stop_hits_sql('de')}
                     AND {_stop_hits_sql('fr')} > 0 THEN 'fr'
                    WHEN {_stop_hits_sql('de')} > 0 THEN 'de'
                    ELSE 'und' END AS lang_pred
        FROM documents
    """,
    "x5_quality_score": f"""
        SELECT doc_id,
               0.4 * ({_STOPRATIO})
             + 0.3 * least(CAST({_NTOK} AS DOUBLE) / 100.0, 1.0)
             + 0.3 * least(({_MEANWL}) / 10.0, 1.0) AS quality
        FROM documents
    """,
    "x5_fingerprint": """
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
        FROM documents
    """,
}

ORACLES["x5_tfidf_top_terms"] = f"""
    WITH doc_terms AS (
        SELECT doc_id, token, COUNT(1) AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents) t
        GROUP BY doc_id, token
    ),
    dfc AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM doc_terms GROUP BY token),
    n AS (SELECT CAST(COUNT(1) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, token,
               CAST(tf AS DOUBLE) * (n.n_docs / df) AS tfidf
        FROM doc_terms JOIN dfc USING (token) CROSS JOIN n
    )
    SELECT doc_id, rnk, token, tfidf FROM (
        SELECT doc_id, token, tfidf,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS BIGINT) AS rnk
        FROM scored
    ) WHERE rnk <= 3
"""

ORACLES["x5_term_frequency"] = f"""
    SELECT token,
           COUNT(1) AS tf,
           COUNT(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents) t
    GROUP BY token
    ORDER BY tf DESC, token
    LIMIT 20
"""

ORACLES["x5_text_features"] = f"""
    SELECT doc_id, lang,
           {_NTOK} AS n_tokens,
           CAST(list_sum(list_transform({_TOKS}, w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_pieces,
           {_STOPRATIO} AS stopword_ratio,
           {_MEANWL} AS mean_word_len,
           0.4 * ({_STOPRATIO})
         + 0.3 * least(CAST({_NTOK} AS DOUBLE) / 100.0, 1.0)
         + 0.3 * least(({_MEANWL}) / 10.0, 1.0) AS quality,
           CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'zh'
                WHEN {_stop_hits_sql('en')} >= {_stop_hits_sql('es')}
                 AND {_stop_hits_sql('en')} >= {_stop_hits_sql('fr')}
                 AND {_stop_hits_sql('en')} >= {_stop_hits_sql('de')}
                 AND {_stop_hits_sql('en')} > 0 THEN 'en'
                WHEN {_stop_hits_sql('es')} >= {_stop_hits_sql('fr')}
                 AND {_stop_hits_sql('es')} >= {_stop_hits_sql('de')}
                 AND {_stop_hits_sql('es')} > 0 THEN 'es'
                WHEN {_stop_hits_sql('fr')} >= {_stop_hits_sql('de')}
                 AND {_stop_hits_sql('fr')} > 0 THEN 'fr'
                WHEN {_stop_hits_sql('de')} > 0 THEN 'de'
                ELSE 'und' END AS lang_pred,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
    FROM documents
"""

ORACLES_EXT = {k: v for k, v in ORACLES.items() if k in QUERIES_EXT}
ORACLES = {k: v for k, v in ORACLES.items() if k not in QUERIES_EXT}


def _q_x5_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) — the third user-extension
    shape next to the pandas scalar/grouped-agg UDFs: one input row in,
    MANY rows out, composed via LATERAL join in SQL. The function packs
    a document's tokens into fixed 10-token chunks (the sequence-window
    shape of a tokenizer-side pipeline).

    Python UDTFs are row-at-a-time — the deliberate slow path, bounded
    here to 50 docs; the SET-BASED equivalent for corpus scale is the
    pure-expression chunking in operators/curation.pack_shards /
    the posexplode-over-slice idiom (same semantics, codegen'd). The
    oracle restates the chunking in DuckDB, so the UDTF demo still
    sits under the hash gate.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk_text string")
    class TokenChunks:
        def eval(self, text: str):
            if text is None:
                return
            toks = [t for t in text.split(" ") if t.strip()]
            for i in range(0, (len(toks) + 9) // 10):
                chunk = toks[i * 10 : i * 10 + 10]
                yield i, len(chunk), " ".join(chunk)

    from odoo_batch_processing_spark.sources.loader import load_table

    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "__udtf_docs"
    )
    spark.udtf.register("token_chunks", TokenChunks)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text
        FROM __udtf_docs d, LATERAL token_chunks(d.text) c
        """
    )


QUERIES_EXT["x5_udtf_chunks"] = _q_x5_udtf_chunks
ORACLES_EXT["x5_udtf_chunks"] = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> trim(x) <> '') AS tk
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           CAST(len(list_slice(tk, i*10+1, i*10+10)) AS INTEGER) AS n_tokens,
           array_to_string(list_slice(tk, i*10+1, i*10+10), ' ') AS chunk_text
    FROM toks, LATERAL (
      SELECT unnest(range(0, CAST(ceil(len(tk)/10.0) AS BIGINT))) AS i
    ) u
"""

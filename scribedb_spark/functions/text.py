"""Text-analysis operators for training-data pipelines (north-star
extension; SURVEY.md §2.10 `text_stats` and friends).

Every operator here is pure built-in SQL expressions (no UDFs), so it
runs JVM-side at full codegen speed and has an exact DuckDB oracle.
Occurrence counting uses the classic
``(length(t) - length(replace(t, w, ''))) / length(w)`` idiom, which
is engine-portable and O(n) per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scribedb_spark.queries import register
from scribedb_spark.sources import table


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (single-space-separated text)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    ).cast("int")


def occurrences(text: Column, word: str) -> Column:
    """Number of (possibly overlapping-free) occurrences of ``word``."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(word), F.lit(""))))
        / F.lit(len(word))
    ).cast("int")


def normalized(text: Column) -> Column:
    """Canonical text: lowercase, collapsed whitespace, trimmed."""
    return F.trim(F.lower(F.regexp_replace(text, " +", " ")))


SQL_NTOK = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)"


def sql_occ(word: str) -> str:
    return (
        f"CAST((length(text) - length(replace(text, '{word}', ''))) / {len(word)} AS INT)"
    )


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id, lang, n_chars,
           CAST(length(text) AS INT) AS text_len,
           {SQL_NTOK} AS n_tokens,
           CAST(length(replace(text, ' ', '')) AS INT) AS n_nonspace,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / {SQL_NTOK} AS avg_token_len
    FROM documents
    """,
)
def text_stats(spark, sf_dir) -> DataFrame:
    """Per-document length/token statistics."""
    d = table(spark, "documents", sf_dir)
    t = F.col("text")
    ntok = ws_token_count(t)
    nonspace = F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("int")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.length(t).cast("int").alias("text_len"),
        ntok.alias("n_tokens"),
        nonspace.alias("n_nonspace"),
        (nonspace.cast("double") / ntok).alias("avg_token_len"),
    )


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           {SQL_NTOK} AS ws_tokens,
           CAST(length(regexp_extract_all(text, '[a-z]+')) AS INT) AS alpha_tokens,
           CAST(length(regexp_extract_all(text, '[aeiou]+')) AS INT) AS vowel_runs
    FROM documents
    """,
)
def text_token_count(spark, sf_dir) -> DataFrame:
    """Token counting: whitespace tokens + regex (BPE-ish pre-token)
    counts. regexp_extract_all is vectorized JVM-side."""
    d = table(spark, "documents", sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        ws_token_count(t).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit("[a-z]+"), F.lit(0)))
        .cast("int")
        .alias("alpha_tokens"),
        F.size(F.regexp_extract_all(t, F.lit("[aeiou]+"), F.lit(0)))
        .cast("int")
        .alias("vowel_runs"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(lower(regexp_replace(text, ' +', ' ', 'g')))) AS content_fp,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS tokenset_fp
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir) -> DataFrame:
    """Document fingerprints: content hash of normalized text +
    order/multiplicity-insensitive token-set hash (the key used by
    content-normalized exact dedup)."""
    d = table(spark, "documents", sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        F.md5(normalized(t)).alias("content_fp"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split(t, " "))), " ")
        ).alias("tokenset_fp"),
    )


#: deterministic marker words per language for the n-gram/stopword
#: heuristic (the corpus vocabulary is synthetic; the heuristic's value
#: is its *determinism and shape*, mirrored exactly in the oracle).
_LANG_MARKERS = {
    "en": ["the", "a"],
    "es": ["data", "valor"],
    "de": ["der", "und"],
    "fr": ["le", "et"],
    "zh": ["zh", "hash"],
}


def _lang_score_sql(lang: str) -> str:
    return " + ".join(sql_occ(w) for w in _LANG_MARKERS[lang])


@register(
    "text_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             {_lang_score_sql('en')} AS sc_en,
             {_lang_score_sql('es')} AS sc_es,
             {_lang_score_sql('de')} AS sc_de,
             {_lang_score_sql('fr')} AS sc_fr,
             {_lang_score_sql('zh')} AS sc_zh
      FROM documents)
    SELECT doc_id, lang, sc_en, sc_es, sc_de, sc_fr, sc_zh,
           CASE WHEN sc_en >= sc_es AND sc_en >= sc_de AND sc_en >= sc_fr AND sc_en >= sc_zh THEN 'en'
                WHEN sc_es >= sc_de AND sc_es >= sc_fr AND sc_es >= sc_zh THEN 'es'
                WHEN sc_de >= sc_fr AND sc_de >= sc_zh THEN 'de'
                WHEN sc_fr >= sc_zh THEN 'fr'
                ELSE 'zh' END AS lang_pred
    FROM s
    """,
)
def text_lang_id(spark, sf_dir) -> DataFrame:
    """Language-ID heuristic: per-language marker-word occurrence
    scores, argmax with a fixed preference order for ties."""
    d = table(spark, "documents", sf_dir)
    t = F.col("text")
    scores = {
        lang: sum(
            (occurrences(t, w) for w in words[1:]),
            occurrences(t, words[0]),
        )
        for lang, words in _LANG_MARKERS.items()
    }
    sc = {lang: scores[lang].alias(f"sc_{lang}") for lang in _LANG_MARKERS}
    order = ["en", "es", "de", "fr", "zh"]
    pred = F.lit("zh")
    for lang in reversed(order[:-1]):
        later = order[order.index(lang) + 1 :]
        cond = None
        for o in later:
            c = scores[lang] >= scores[o]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return d.select("doc_id", "lang", *sc.values(), pred.alias("lang_pred"))


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           {SQL_NTOK} AS n_tokens,
           {sql_occ('the')} AS n_stop,
           CAST(CASE WHEN {SQL_NTOK} < 100 THEN {SQL_NTOK} ELSE 100 END AS DOUBLE) / 100
             AS len_score,
           CAST({sql_occ('the')} AS DOUBLE) / {SQL_NTOK} AS stop_ratio,
           0.5 * (CAST(CASE WHEN {SQL_NTOK} < 100 THEN {SQL_NTOK} ELSE 100 END AS DOUBLE) / 100)
             + 0.5 * (CAST({sql_occ('the')} AS DOUBLE) / {SQL_NTOK}) AS quality
    FROM documents
    """,
)
def text_quality_score(spark, sf_dir) -> DataFrame:
    """Quality scoring: length score (saturating at 100 tokens) +
    stopword ratio, combined 50/50 — the standard shape of heuristic
    quality filters for LLM corpora."""
    d = table(spark, "documents", sf_dir)
    t = F.col("text")
    ntok = ws_token_count(t)
    nstop = occurrences(t, "the")
    len_score = F.least(ntok, F.lit(100)).cast("double") / 100
    stop_ratio = nstop.cast("double") / ntok
    return d.select(
        "doc_id",
        ntok.alias("n_tokens"),
        nstop.alias("n_stop"),
        len_score.alias("len_score"),
        stop_ratio.alias("stop_ratio"),
        (0.5 * len_score + 0.5 * stop_ratio).alias("quality"),
    )

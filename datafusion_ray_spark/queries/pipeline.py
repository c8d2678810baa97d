"""Training-data pipeline queries, batch 2: chunking, PII redaction,
length histograms, source mixing.

These extend the LLM-pipeline surface of coverage4 (split/normalize/
contamination/sampling) with the remaining preprocessing stages a corpus
pipeline runs before tokenization: fixed-window chunking with overlap,
PII scrubbing, length-distribution profiling, and source rebalancing.
All stay in pure ``pyspark.sql`` expressions (embarrassingly parallel,
no shuffles beyond the final aggregations) with exact DuckDB oracles.

Cross-engine notes: Spark SQL string literals process ``\\`` escapes while
DuckDB's are raw, so regex patterns are spelled per engine; Spark
``REGEXP_REPLACE`` is global while DuckDB needs the ``'g'`` flag; integer
division is ``DIV`` vs ``//``; hex→int is ``CONV(h,16,10)`` vs a ``'0x…'``
cast.
"""

from __future__ import annotations

from .tpch import QueryDef, cents

_Q: dict[str, QueryDef] = {}


def _q(name: str, sql: str, description: str, oracle: str | None = None) -> None:
    _Q[name] = QueryDef(name=name, sql=sql.strip(), description=description,
                        oracle=oracle.strip() if oracle else None)


# Fixed-size token chunking with overlap (chunk 64 tokens, stride 48 →
# 16-token overlap), the context-window preprocessing step. Chunk count per
# doc = 1 + max(0, ceil((n_tok - size) / stride)); the hash certifies the
# exact chunk text.
_q(
    "doc_chunk",
    """
WITH toks AS (
    SELECT doc_id, SPLIT(text, ' ') AS tokens,
           SIZE(SPLIT(text, ' ')) AS n_tok
    FROM documents
),
idx AS (
    SELECT doc_id, tokens,
           EXPLODE(SEQUENCE(0, CAST(GREATEST(CEIL((n_tok - 64) / 48.0), 0) AS INT))) AS chunk_id
    FROM toks
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(SIZE(SLICE(tokens, chunk_id * 48 + 1, 64)) AS INT) AS n_tokens,
       MD5(ARRAY_JOIN(SLICE(tokens, chunk_id * 48 + 1, 64), ' ')) AS chunk_hash
FROM idx
ORDER BY doc_id, chunk_id
""",
    "token chunking: 64-token windows, stride 48 (16-token overlap)",
    oracle="""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS tokens,
           len(string_split(text, ' ')) AS n_tok
    FROM documents
),
idx AS (
    SELECT doc_id, tokens,
           unnest(range(0, CAST(GREATEST(CEIL((n_tok - 64) / 48.0), 0) AS INT) + 1)) AS chunk_id
    FROM toks
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(list_slice(tokens, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS INT) AS n_tokens,
       MD5(array_to_string(list_slice(tokens, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')) AS chunk_hash
FROM idx
ORDER BY doc_id, chunk_id
""",
)


# PII redaction. The synthetic corpus has no real PII, so deterministic
# fake emails/IPs/phones are injected first (keyed on doc_id), then counted
# and scrubbed; the hash certifies the exact redacted text.
_SPARK_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_SPARK_IP = r"\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_SPARK_PHONE = r"\\b\\d{3}-\\d{4}\\b"
_DUCK_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_DUCK_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_DUCK_PHONE = r"\b\d{3}-\d{4}\b"

_PII_AUG_SPARK = """
    SELECT doc_id,
           CONCAT(text,
                  CASE WHEN doc_id % 7 = 0
                       THEN CONCAT(' contact user', CAST(doc_id AS STRING), '@example.com now')
                       ELSE '' END,
                  CASE WHEN doc_id % 11 = 0
                       THEN CONCAT(' host 10.0.', CAST(doc_id % 256 AS STRING), '.',
                                   CAST(doc_id % 100 AS STRING), ' up')
                       ELSE '' END,
                  CASE WHEN doc_id % 13 = 0 THEN ' call 555-0142 today' ELSE '' END) AS text
    FROM documents
"""
_PII_AUG_DUCK = _PII_AUG_SPARK.replace("AS STRING", "AS VARCHAR")

_q(
    "pii_redact",
    f"""
WITH aug AS ({_PII_AUG_SPARK})
SELECT doc_id,
       CAST(REGEXP_COUNT(text, '{_SPARK_EMAIL}') AS INT) AS n_emails,
       CAST(REGEXP_COUNT(text, '{_SPARK_IP}') AS INT) AS n_ips,
       CAST(REGEXP_COUNT(text, '{_SPARK_PHONE}') AS INT) AS n_phones,
       MD5(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
           '{_SPARK_EMAIL}', '<EMAIL>'),
           '{_SPARK_IP}', '<IP>'),
           '{_SPARK_PHONE}', '<PHONE>')) AS redacted_hash
FROM aug
ORDER BY doc_id
""",
    "PII scrub: email/IP/phone detection counts + redacted-text hash",
    oracle=f"""
WITH aug AS ({_PII_AUG_DUCK})
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_DUCK_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_DUCK_IP}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{_DUCK_PHONE}')) AS INT) AS n_phones,
       MD5(regexp_replace(regexp_replace(regexp_replace(text,
           '{_DUCK_EMAIL}', '<EMAIL>', 'g'),
           '{_DUCK_IP}', '<IP>', 'g'),
           '{_DUCK_PHONE}', '<PHONE>', 'g')) AS redacted_hash
FROM aug
ORDER BY doc_id
""",
)


# Length-distribution histogram on exact log2 buckets. LENGTH(BIN(n)) =
# floor(log2(n)) + 1 with pure integer arithmetic — no float-on-the-
# boundary hazard (both engines print minimal-width binary).
_LEN_HIST = """
SELECT CAST(LENGTH(BIN(n_chars)) AS INT) AS log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY 1
ORDER BY 1
"""
_q(
    "len_histogram",
    _LEN_HIST,
    "document length histogram on exact integer log2 buckets",
    oracle=_LEN_HIST,
)


# Source rebalancing ("uniform remix"): downsample every source to ~the
# smallest source's size with a deterministic md5-threshold filter. The
# per-source keep-rate is computed FROM the data (two-phase: count, then
# broadcast-joined thresholds), so this exercises the dynamic-sampling
# shape, not a hardcoded rate. 16-bit integer thresholds compare exactly
# in both engines.
_q(
    "source_mix",
    """
WITH counts AS (
    SELECT source, COUNT(*) AS c FROM documents GROUP BY source
),
tgt AS (SELECT MIN(c) AS target FROM counts),
rates AS (
    SELECT source, CAST(target * 65536 DIV c AS BIGINT) AS thr
    FROM counts CROSS JOIN tgt
)
SELECT d.source,
       CAST(r.thr AS BIGINT) AS thr,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
FROM documents d JOIN rates r ON d.source = r.source
WHERE CAST(CONV(SUBSTRING(MD5(CAST(d.doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) < r.thr
GROUP BY d.source, r.thr
ORDER BY d.source
""",
    "source remix: downsample each source to the smallest source's size",
    oracle="""
WITH counts AS (
    SELECT source, COUNT(*) AS c FROM documents GROUP BY source
),
tgt AS (SELECT MIN(c) AS target FROM counts),
rates AS (
    SELECT source, CAST(target * 65536 // c AS BIGINT) AS thr
    FROM counts CROSS JOIN tgt
)
SELECT d.source,
       CAST(r.thr AS BIGINT) AS thr,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
FROM documents d JOIN rates r ON d.source = r.source
WHERE CAST(CONCAT('0x', SUBSTRING(MD5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < r.thr
GROUP BY d.source, r.thr
ORDER BY d.source
""",
)

# Mergeable equi-width histogram quantile sketch: $1000 buckets over
# l_extendedprice (integer cents), cumulative counts over the (bounded,
# few-hundred-row) bucket table, linear interpolation inside the bucket
# where the cumulative count crosses the target rank. Histograms merge by
# elementwise addition, so shards/days compose — and unlike a GK sketch the
# estimate is deterministic, so it hash-certifies against the same
# interpolation in DuckDB alongside the exact percentile.
_HIST_Q = """
WITH h AS (
    SELECT {cents} DIV 100000 AS bucket, COUNT(*) AS c
    FROM lineitem
    GROUP BY 1
),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n, COUNT(*) AS n_buckets FROM h),
cum AS (
    SELECT bucket, c,
           SUM(c) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM h
),
med AS (
    SELECT CAST(bucket AS DOUBLE) AS bucket, CAST(c AS DOUBLE) AS c,
           CAST(cum - c AS DOUBLE) AS cum_prev
    FROM cum CROSS JOIN tot
    WHERE cum - c < 0.5 * n AND cum >= 0.5 * n
),
ex AS (SELECT {pctl} AS exact_med FROM lineitem)
SELECT CAST(t.n_buckets AS BIGINT) AS n_buckets,
       ROUND((m.bucket * 100000 + 100000 * (0.5 * t.n - m.cum_prev) / m.c) / 100.0, 4) AS est_median,
       ROUND(e.exact_med, 4) AS exact_median,
       ABS((m.bucket * 100000 + 100000 * (0.5 * t.n - m.cum_prev) / m.c) / 100.0
           - e.exact_med) <= 1000.0 AS within_bucket
FROM med m CROSS JOIN tot t CROSS JOIN ex e
"""

# Spark side (r12, guide §1.2/§2.4): ONE corpus pass instead of four plan
# scans (two survived runtime exchange reuse — the exact-percentile
# ObjectHashAggregate leg alone was ~60% of the wall, its partial bounded
# to the parquet's 3 row groups and its final merge to one task holding
# every distinct price in a serialized map). Everything now derives from
# a single (price, count) aggregate: the histogram buckets are monotone
# in price (cents DIV is order-preserving), so the bucket CDF rides the
# same value-ordered window as the exact-median CDF, and the exact
# median replicates Spark PERCENTILE's interpolation arithmetic
# ((hi-pos)*lo + (pos-lo)*hi over the two straddling order statistics)
# from the cumulative counts — bit-identical output (verified old==new
# at all three SFs), certified against the UNREWRITTEN DuckDB
# QUANTILE_CONT oracle below. The distinct-price table is bounded by the
# price domain, so every post-scan stage stays vocabulary-scale at any
# corpus size, and the counts shuffle replaces the old plan's opaque
# serialized percentile maps (5.3 MB for 6 rows at sf0.1).
_HIST_Q_SPARK = """
WITH vf AS (
    SELECT l_extendedprice AS v, COUNT(*) AS c
    FROM lineitem
    GROUP BY l_extendedprice
),
vc AS (
    SELECT v, c,
           {cents_v} DIV 100000 AS bucket,
           SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS vcum,
           SUM(c) OVER () AS ntot
    FROM vf
),
vb AS (
    SELECT v, c, bucket, vcum, ntot,
           SUM(c) OVER (PARTITION BY bucket) AS cb,
           MAX(vcum) OVER (PARTITION BY bucket) AS bcum
    FROM vc
),
agg AS (
    SELECT
        CAST(SUM(IF(vcum = bcum, 1, 0)) AS BIGINT) AS n_buckets,
        CAST(MAX(ntot) AS DOUBLE) AS n,
        MIN_BY(CAST(bucket AS DOUBLE), IF(2 * vcum >= ntot, vcum, NULL)) AS mbucket,
        MIN_BY(CAST(cb AS DOUBLE), IF(2 * vcum >= ntot, vcum, NULL)) AS mc,
        MIN_BY(CAST(bcum - cb AS DOUBLE), IF(2 * vcum >= ntot, vcum, NULL)) AS mcum_prev,
        MIN(CASE WHEN vcum >= CAST(FLOOR(0.5 * (ntot - 1)) AS BIGINT) + 1
                 THEN v END) AS lo,
        MIN(CASE WHEN vcum >= CAST(FLOOR(0.5 * (ntot - 1)) AS BIGINT) + 2
                 THEN v END) AS hi,
        MAX(0.5 * (ntot - 1) - FLOOR(0.5 * (ntot - 1))) AS g
    FROM vb
),
ex AS (
    SELECT agg.*,
           CASE WHEN hi IS NULL OR g = 0.0 THEN lo
                ELSE (1.0 - g) * lo + g * hi END AS exact_med
    FROM agg
)
SELECT n_buckets,
       ROUND((mbucket * 100000 + 100000 * (0.5 * n - mcum_prev) / mc) / 100.0, 4) AS est_median,
       ROUND(exact_med, 4) AS exact_median,
       ABS((mbucket * 100000 + 100000 * (0.5 * n - mcum_prev) / mc) / 100.0
           - exact_med) <= 1000.0 AS within_bucket
FROM ex
"""

_q(
    "sketch_hist_quantile",
    _HIST_Q_SPARK.format(cents_v=cents("v")),
    "histogram quantile sketch: $1000-bucket median estimate vs exact",
    oracle=_HIST_Q.replace(" DIV ", " // ").format(
        cents=cents("l_extendedprice"),
        pctl="QUANTILE_CONT(l_extendedprice, 0.5)",
    ),
)

# Corpus vocabulary profile: one row of tokenizer-planning stats — vocab
# size, token mass, hapax count (vocabulary long-tail), and the modal word
# (deterministic min-word tiebreak among maxima). One word-keyed
# map-side-combinable shuffle; output is a single row regardless of corpus.
_q(
    "vocab_stats",
    """
WITH words AS (
    SELECT EXPLODE(SPLIT(TRIM(text), '\\\\s+')) AS word FROM documents
),
wc AS (SELECT word, COUNT(*) AS c FROM words GROUP BY word)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(c) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
       MIN(CASE WHEN c = (SELECT MAX(c) FROM wc) THEN word END) AS top_word,
       CAST(MAX(c) AS BIGINT) AS top_word_count
FROM wc
""",
    "corpus vocabulary profile: vocab size, hapax count, modal word",
    oracle="""
WITH words AS (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents
),
wc AS (SELECT word, COUNT(*) AS c FROM words GROUP BY word)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(c) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
       MIN(CASE WHEN c = (SELECT MAX(c) FROM wc) THEN word END) AS top_word,
       CAST(MAX(c) AS BIGINT) AS top_word_count
FROM wc
""",
)


# Deterministic uniform sample: rank by md5(seed || id) and take k — the
# distributed equivalent of reservoir sampling (hash rank is a random
# permutation, so any k-prefix is a uniform k-subset), but reproducible
# and plannable as TakeOrderedAndProject (no global sort materialized).
_q(
    "sample_uniform",
    """
SELECT doc_id, source
FROM documents
ORDER BY MD5(CONCAT('7:', CAST(doc_id AS STRING))), doc_id
LIMIT 100
""",
    "seeded uniform k-sample via hash ranking (reservoir-equivalent, "
    "TakeOrdered plan)",
    oracle="""
SELECT doc_id, source
FROM documents
ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id
LIMIT 100
""",
)

# Temperature-based language rebalancing (the multilingual sampling rule of
# Lample & Conneau, "Cross-lingual language model pretraining", 2019 §3.1,
# exponent alpha = 0.5 i.e. T = 2): keep-rate r_l ∝ p_l^(alpha-1) =
# sqrt(c_min/c_l), normalized so the rarest language keeps everything —
# flattens the language distribution toward (but not all the way to)
# uniform. Deterministic hash acceptance per doc; IEEE sqrt is correctly
# rounded, so the integer thresholds are engine-identical.
_q(
    "lang_temperature_mix",
    """
WITH counts AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
mn AS (SELECT MIN(c) AS cmin FROM counts),
rates AS (
    SELECT lang, c,
           CAST(FLOOR(65536 * SQRT(CAST(cmin AS DOUBLE) / c)) AS BIGINT) AS thr
    FROM counts CROSS JOIN mn
)
SELECT d.lang,
       CAST(r.c AS BIGINT) AS n_before,
       CAST(r.thr AS BIGINT) AS thr,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST(CONV(SUBSTRING(MD5(CONCAT('13:', CAST(d.doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT) < r.thr
GROUP BY d.lang, r.c, r.thr
ORDER BY d.lang
""",
    "temperature (T=2) language rebalancing: keep-rate sqrt(c_min/c_l), "
    "deterministic hash acceptance",
    oracle="""
WITH counts AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
mn AS (SELECT MIN(c) AS cmin FROM counts),
rates AS (
    SELECT lang, c,
           CAST(FLOOR(65536 * SQRT(CAST(cmin AS DOUBLE) / c)) AS BIGINT) AS thr
    FROM counts CROSS JOIN mn
)
SELECT d.lang,
       CAST(r.c AS BIGINT) AS n_before,
       CAST(r.thr AS BIGINT) AS thr,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST(CONCAT('0x', SUBSTRING(MD5('13:' || CAST(d.doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < r.thr
GROUP BY d.lang, r.c, r.thr
ORDER BY d.lang
""",
)

# Deterministic WEIGHTED sample without replacement (Efraimidis & Spirakis,
# "Weighted random sampling with a reservoir", IPL 2006): key_i =
# ln(u_i)/w_i with u_i a seeded hash-uniform in (0,1); the top-k by key is
# distributed exactly like weighted sampling without replacement. Same
# TakeOrderedAndProject plan as sample_uniform — no global sort, no state.
# Weight = n_chars (longer docs proportionally likelier), the usual
# size-weighted corpus sampling. Key values never leave the ORDER BY, so
# last-ulp libm differences between engines cannot affect emitted columns.
_q(
    "sample_weighted",
    """
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight
FROM documents
WHERE n_chars > 0
ORDER BY LN((CAST(CONV(SUBSTRING(MD5(CONCAT('11:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS DOUBLE) + 0.5)
           / 4294967296.0) / n_chars DESC,
         doc_id
LIMIT 100
""",
    "seeded weighted k-sample without replacement (Efraimidis-Spirakis "
    "hash keys, TakeOrdered plan)",
    oracle="""
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight
FROM documents
WHERE n_chars > 0
ORDER BY ln((CAST(CAST('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
            / 4294967296.0) / n_chars DESC,
         doc_id
LIMIT 100
""",
)

PIPELINE_QUERIES: dict[str, QueryDef] = dict(_Q)

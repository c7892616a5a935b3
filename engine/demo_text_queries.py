"""Text-analysis + deduplication queries over the `documents` table —
the training-data-pipeline operator families (language-ID heuristics,
quality scoring, token counting, fingerprinting, exact/MinHash/Jaccard
dedup), each with a DuckDB oracle.  Same parity discipline as
demo_queries.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from .demo_queries import _t

_STOPWORDS = ("the", "a", "of")
JACCARD_BUCKET_CAP = 64  # skip boilerplate mega-buckets in the pair join
_HASH_DENOM = float(1 << 32)  # md5-first-8-hex fraction denominator
_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
_MARKERS = ("scan", "join", "window")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_text_features(spark, sf_dir):
    """Per-document text-analysis features in ONE projection: quality
    scoring (token count, alpha ratio, stopword ratio — the documents-table
    analog of the clips CHAR_RATIO/length rules), BPE-ish regex token
    counting (letters / digit runs / punct singles), and the
    marker-frequency language-ID heuristic (count-occurrences via
    length/replace arithmetic — exact in both engines).  Merged from the
    round-3 `text_quality` / `token_count_bpe` / `langid_marker` entries:
    all three were per-doc column expressions over the same scan, so one
    entry keeps the 50-entry driver correctness window intact and reads
    the documents table once instead of three times."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    n_tok = F.size(toks)
    n_alpha = F.length(F.regexp_replace("text", r"[^a-zA-Z]", ""))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    counts = [
        ((F.length("text") - F.length(F.replace(F.col("text"), F.lit(m))))
         / F.lit(len(m))).cast("long").alias(f"n_{m}")
        for m in _MARKERS
    ]
    df = d.select(
        "doc_id", "lang",
        n_tok.alias("n_tokens"),
        F.round(n_alpha.cast("double") / F.length("text"), 6).alias("alpha_ratio"),
        F.round(n_stop.cast("double") / n_tok, 6).alias("stopword_ratio"),
        ((n_tok >= 20) & (n_alpha.cast("double") / F.length("text") > 0.6))
        .alias("quality_ok"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0))
        .alias("n_bpe_tokens"),
        F.length("text").alias("n_chars"),
        *counts)
    best = (F.when((F.col("n_scan") >= F.col("n_join"))
                   & (F.col("n_scan") >= F.col("n_window")), "scan-ish")
            .when(F.col("n_join") >= F.col("n_window"), "join-ish")
            .otherwise("window-ish"))
    return df.withColumn("marker_class", best)


SQL_TEXT_FEATURES = r"""
WITH t AS (
  SELECT doc_id, lang, text, string_split_regex(text, '\s+') AS toks,
         LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
         (LENGTH(text) - LENGTH(replace(text, 'scan', ''))) / 4 AS n_scan,
         (LENGTH(text) - LENGTH(replace(text, 'join', ''))) / 4 AS n_join,
         (LENGTH(text) - LENGTH(replace(text, 'window', ''))) / 6 AS n_window
  FROM documents)
SELECT doc_id, lang,
       len(toks) AS n_tokens,
       ROUND(CAST(n_alpha AS DOUBLE) / LENGTH(text), 6) AS alpha_ratio,
       ROUND(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of')))
                  AS DOUBLE) / len(toks), 6) AS stopword_ratio,
       len(toks) >= 20 AND CAST(n_alpha AS DOUBLE) / LENGTH(text) > 0.6
           AS quality_ok,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
           AS n_bpe_tokens,
       LENGTH(text) AS n_chars,
       CAST(n_scan AS BIGINT) AS n_scan,
       CAST(n_join AS BIGINT) AS n_join,
       CAST(n_window AS BIGINT) AS n_window,
       CASE WHEN n_scan >= n_join AND n_scan >= n_window THEN 'scan-ish'
            WHEN n_join >= n_window THEN 'join-ish'
            ELSE 'window-ish' END AS marker_class
FROM t
"""


# ---------------------------------------------------------------------------
# deduplication families
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash — BOTH group families in one entry:
    `exact` rows are md5(text) equality groups with >1 copy, canonical =
    min doc_id (the documents-table analog of the clips EXACT_DUP rule);
    `fingerprint` rows are ALL normalize-then-hash collision groups
    (lowercase, strip non-letters — the robust-fingerprint variant).
    Merged from the round-3 `dedup_exact` / `doc_fingerprint` entries
    (same group-by-hash shape over the same scan) to keep the 50-entry
    driver correctness window intact."""
    d = _t(spark, sf_dir, "documents")
    exact = (d.withColumn("h", F.md5("text"))
             .groupBy("h")
             .agg(F.count("*").alias("n_docs"),
                  F.min("doc_id").alias("canonical_doc"))
             .where(F.col("n_docs") > 1)
             .select(F.lit("exact").alias("kind"), "h", "n_docs",
                     "canonical_doc"))
    fp = F.md5(F.lower(F.regexp_replace("text", r"[^a-zA-Z]", "")))
    fps = (d.withColumn("h", fp)
           .groupBy("h")
           .agg(F.count("*").alias("n_docs"),
                F.min("doc_id").alias("canonical_doc"))
           .select(F.lit("fingerprint").alias("kind"), "h", "n_docs",
                   "canonical_doc"))
    return exact.unionByName(fps)


SQL_DEDUP_EXACT = """
SELECT 'exact' AS kind, md5(text) AS h, COUNT(*) AS n_docs,
       MIN(doc_id) AS canonical_doc
FROM documents GROUP BY 2 HAVING COUNT(*) > 1
UNION ALL
SELECT 'fingerprint' AS kind,
       md5(lower(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) AS h,
       COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
FROM documents GROUP BY 2
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash + LSH banding: 4 md5-minhash signatures over the token set,
    2 bands of 2 sigs each, report buckets with >1 doc (the shingle ->
    minhash -> band -> bucket-join pipeline; md5 keeps both engines
    bit-identical)."""
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("doc_id", F.explode(F.array_distinct(
        F.split(F.col("text"), r"\s+"))).alias("tok")))
    sigs = toks.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.col("tok"), F.lit(f"#{i}")))).alias(f"s{i}")
          for i in range(4)])
    bands = sigs.select(
        "doc_id",
        F.md5(F.concat("s0", "s1")).alias("band_a"),
        F.md5(F.concat("s2", "s3")).alias("band_b"))
    stacked = (bands.select("doc_id", F.lit("a").alias("band_no"),
                            F.col("band_a").alias("band_key"))
               .unionByName(bands.select("doc_id", F.lit("b").alias("band_no"),
                                         F.col("band_b").alias("band_key"))))
    return (stacked.groupBy("band_no", "band_key")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("canonical_doc"))
            .where(F.col("n_docs") > 1))


SQL_DEDUP_MINHASH_LSH = r"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
  FROM documents),
sigs AS (
  SELECT doc_id,
         MIN(md5(tok || '#0')) AS s0, MIN(md5(tok || '#1')) AS s1,
         MIN(md5(tok || '#2')) AS s2, MIN(md5(tok || '#3')) AS s3
  FROM toks GROUP BY doc_id),
bands AS (
  SELECT doc_id, 'a' AS band_no, md5(s0 || s1) AS band_key FROM sigs
  UNION ALL
  SELECT doc_id, 'b' AS band_no, md5(s2 || s3) AS band_key FROM sigs)
SELECT band_no, band_key, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
FROM bands GROUP BY 1, 2 HAVING COUNT(*) > 1
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Token-set Jaccard near-dup pairs, scale-safe: MinHash-band CANDIDATE
    generation (8 md5-minhash sigs -> 4 bands of 2; the self-join key is
    the band bucket) then an exact-Jaccard VERIFY stage over only the
    candidate pairs.

    The round-1 version blocked on `source` — O(block^2) with a hot source
    going quadratic at corpus scale.  Banding keeps every shuffle keyed by
    a hash value: for jaccard >= 0.8 a 2-sig band matches with p = 0.64,
    so 4 bands recall 1-(1-0.64)^4 ~ 98% of qualifying pairs; md5 makes
    the candidate set bit-identical in Spark and DuckDB, so the oracle
    mirrors the banding exactly.

    Skew guard (JACCARD_BUCKET_CAP, mirrored in the SQL): a boilerplate
    mega-cluster collapses thousands of docs into ONE band bucket — this
    corpus has a 3165-doc bucket = 20.7M candidate pairs at sf0.1 — and a
    pair-emitting operator is inherently quadratic in such a cluster, so
    buckets wider than the cap are skipped; template clusters belong to
    the fingerprint/exact-dup GROUP operators (doc_fingerprint,
    dedup_exact), which report them in O(cluster) as one group row."""
    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), r"\s+")).alias("toks"))
    toks = docs.select("doc_id", F.explode("toks").alias("tok"))
    sigs = toks.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.col("tok"), F.lit(f"#{i}")))).alias(f"s{i}")
          for i in range(8)])
    stacked = None
    for i in range(4):
        part = sigs.select(
            "doc_id", F.lit(f"b{i}").alias("band_no"),
            F.md5(F.concat(F.col(f"s{2 * i}"), F.col(f"s{2 * i + 1}")))
            .alias("band_key"))
        stacked = part if stacked is None else stacked.unionByName(part)
    from pyspark.sql import Window
    wb = Window.partitionBy("band_no", "band_key")
    stacked = (stacked.withColumn("_bw", F.count("*").over(wb))
               .where(F.col("_bw") <= JACCARD_BUCKET_CAP).drop("_bw"))
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (a.join(b, (F.col("a.band_no") == F.col("b.band_no"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size("toks_a") + F.size("toks_b") - inter
    jac = inter.cast("double") / union.cast("double")
    # size prefilter IMPLIED by jaccard >= 0.8 (|A∩B| <= min sizes forces
    # 5*|A| >= 4*|B| and vice versa): prunes before the O(|A|+|B|)
    # intersect — provably result-neutral, mirrored in the oracle SQL
    size_ok = ((F.size("toks_a") * 5 >= F.size("toks_b") * 4)
               & (F.size("toks_b") * 5 >= F.size("toks_a") * 4))
    return (cand.join(da, "doc_a").join(db, "doc_b")
            .where(size_ok)
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= 0.8))


SQL_DEDUP_NGRAM_JACCARD = rf"""
WITH docs AS (
  SELECT doc_id, list_distinct(string_split_regex(text, '\s+')) AS toks
  FROM documents),
toks AS (
  SELECT DISTINCT doc_id, unnest(toks) AS tok FROM docs),
sigs AS (
  SELECT doc_id,
         MIN(md5(tok || '#0')) AS s0, MIN(md5(tok || '#1')) AS s1,
         MIN(md5(tok || '#2')) AS s2, MIN(md5(tok || '#3')) AS s3,
         MIN(md5(tok || '#4')) AS s4, MIN(md5(tok || '#5')) AS s5,
         MIN(md5(tok || '#6')) AS s6, MIN(md5(tok || '#7')) AS s7
  FROM toks GROUP BY doc_id),
bands0 AS (
  SELECT doc_id, 'b0' AS band_no, md5(s0 || s1) AS band_key FROM sigs
  UNION ALL SELECT doc_id, 'b1', md5(s2 || s3) FROM sigs
  UNION ALL SELECT doc_id, 'b2', md5(s4 || s5) FROM sigs
  UNION ALL SELECT doc_id, 'b3', md5(s6 || s7) FROM sigs),
bands AS (
  SELECT doc_id, band_no, band_key FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band_no, band_key) AS bw
    FROM bands0) t
  WHERE bw <= {JACCARD_BUCKET_CAP}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE)
             / (len(da.toks) + len(db.toks)
                - len(list_intersect(da.toks, db.toks))), 6) AS jaccard
FROM cand c
JOIN docs da ON da.doc_id = c.doc_a
JOIN docs db ON db.doc_id = c.doc_b
WHERE len(da.toks) * 5 >= len(db.toks) * 4
  AND len(db.toks) * 5 >= len(da.toks) * 4
  AND CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE)
      / (len(da.toks) + len(db.toks)
         - len(list_intersect(da.toks, db.toks))) >= 0.8
"""


WINNOW_K = 8   # k-gram length
WINNOW_W = 16  # winnowing window (min hash per window of consecutive k-grams)


def q_doc_winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprints (the classic rolling-hash document
    fingerprinting scheme: hash every k-gram, keep the minimum hash in
    each sliding window of w consecutive k-grams — guarantees any match
    of length >= w+k-1 shares a fingerprint).  Per doc: the distinct
    selected fingerprints, reported as count + the smallest fingerprint
    (a compact doc signature).  Everything is md5-derived so Spark and
    DuckDB select identical fingerprints; position explosion keys every
    shuffle by doc_id."""
    d = _t(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", "[^a-zA-Z]", ""))
    base = (d.select("doc_id", norm.alias("nt"))
            .where(F.length("nt") >= WINNOW_K))
    pos = (base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("nt") - WINNOW_K + 1))
        .alias("p"),
        "nt"))
    h = (F.conv(F.substring(F.md5(F.substring(F.col("nt"), F.col("p"),
                                              WINNOW_K)), 1, 8), 16, 10)
         .cast("long"))
    from pyspark.sql import Window
    w = (Window.partitionBy("doc_id").orderBy("p")
         .rowsBetween(0, WINNOW_W - 1))
    fps = (pos.select("doc_id", "p", h.alias("h"))
           .withColumn("wmin", F.min("h").over(w))
           .select("doc_id", "wmin").distinct())
    return (fps.groupBy("doc_id")
            .agg(F.count("*").alias("n_fingerprints"),
                 F.min("wmin").alias("min_fingerprint")))


SQL_DOC_WINNOW_FINGERPRINT = f"""
WITH base AS (
  SELECT doc_id, lower(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS nt
  FROM documents),
pos AS (
  SELECT doc_id, nt, unnest(range(1, LENGTH(nt) - {WINNOW_K} + 2)) AS p
  FROM base WHERE LENGTH(nt) >= {WINNOW_K}),
hashes AS (
  SELECT doc_id, p,
         CAST(('0x' || substr(md5(substr(nt, CAST(p AS INT), {WINNOW_K})),
                              1, 8)) AS BIGINT) AS h
  FROM pos),
wmins AS (
  SELECT DISTINCT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS wmin
  FROM hashes)
SELECT doc_id, COUNT(*) AS n_fingerprints, MIN(wmin) AS min_fingerprint
FROM wmins GROUP BY doc_id
"""


def q_report_rollup(spark, sf_dir):
    """Hierarchical rollup report: per-(lang, source) counts with lang
    subtotals and a grand total in ONE aggregation pass (GROUP BY ROLLUP)
    — the one-pass form of the reference's repeated per-stratum summary
    tables (Step6-Evaluation.R:100-127 recomputes each level separately).
    Subtotal rows are distinguished by grouping flags, not null-sniffing,
    so null data values would not be confused with rollup levels."""
    d = _t(spark, sf_dir, "documents")
    return (d.rollup("lang", "source")
            .agg(F.grouping("lang").cast("int").alias("g_lang"),
                 F.grouping("source").cast("int").alias("g_source"),
                 F.count("*").alias("n_docs"),
                 F.round(F.avg(F.length("text")), 4).alias("avg_chars"))
            .select(F.coalesce("lang", F.lit("<all>")).alias("lang"),
                    F.coalesce("source", F.lit("<all>")).alias("source"),
                    "g_lang", "g_source", "n_docs", "avg_chars"))


SQL_REPORT_ROLLUP = """
SELECT COALESCE(lang, '<all>') AS lang,
       COALESCE(source, '<all>') AS source,
       CAST(GROUPING(lang) AS INT) AS g_lang,
       CAST(GROUPING(source) AS INT) AS g_source,
       COUNT(*) AS n_docs,
       ROUND(AVG(LENGTH(text)), 4) AS avg_chars
FROM documents GROUP BY ROLLUP(lang, source)
"""


KMV_K = 64


def q_distinct_kmv(spark, sf_dir):
    """Deterministic KMV (k-minimum-values) cardinality sketch over the
    corpus vocabulary, next to the exact count.  Unlike HLL
    (approx_count_distinct), KMV over md5 hash fractions is bit-identical
    across engines/runs, so the ORACLE can gate a SKETCH: estimate =
    (K-1) / kth_smallest_hash_fraction.  At corpus scale the sketch is
    mergeable (union the per-partition K smallest) and sized O(K), the
    same role HLL plays in production counters."""
    d = _t(spark, sf_dir, "documents")
    toks = (d.select(F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
            .where(F.col("tok") != "").distinct())
    hf = (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
          / F.lit(_HASH_DENOM))
    kth = (toks.select(hf.alias("hf")).orderBy("hf").limit(KMV_K)
           .agg(F.max("hf").alias("kth"), F.count("*").alias("k")))
    exact = toks.agg(F.count("*").alias("n_exact"))
    return (exact.crossJoin(kth)
            .select("n_exact", "k",
                    F.round("kth", 9).alias("kth_frac"),
                    F.round((F.col("k") - 1) / F.col("kth"), 2)
                    .alias("kmv_estimate")))


SQL_DISTINCT_KMV = rf"""
WITH toks AS (
  SELECT DISTINCT unnest(string_split_regex(text, '\s+')) AS tok
  FROM documents),
t2 AS (SELECT tok FROM toks WHERE tok <> ''),
hf AS (
  SELECT CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) / {_HASH_DENOM} AS hf
  FROM t2),
kth AS (
  SELECT MAX(hf) AS kth, COUNT(*) AS k
  FROM (SELECT hf FROM hf ORDER BY hf LIMIT {KMV_K}) q),
exact AS (SELECT COUNT(*) AS n_exact FROM t2)
SELECT n_exact, k, ROUND(kth, 9) AS kth_frac,
       ROUND((k - 1) / kth, 2) AS kmv_estimate
FROM exact, kth
"""


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary stats — the wordcount of training-data pipelines:
    per-token document frequency + total occurrences, top 25 by document
    frequency (ties broken by token).  One explode + one hash agg; at
    corpus scale the token is the shuffle key and partial aggregation
    bounds the map-side output by vocabulary size, not corpus size."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
    stats = (toks.where(F.col("tok") != "")
             .groupBy("tok")
             .agg(F.countDistinct("doc_id").alias("doc_freq"),
                  F.count("*").alias("n_occurrences")))
    return (stats.orderBy(F.desc("doc_freq"), F.desc("n_occurrences"),
                          F.asc("tok"))
            .limit(25))


SQL_VOCAB_TOPK = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
  FROM documents)
SELECT tok, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS n_occurrences
FROM toks WHERE tok <> ''
GROUP BY tok
ORDER BY doc_freq DESC, n_occurrences DESC, tok ASC
LIMIT 25
"""


SAMPLE_RATES = {"en": 0.3, "zh": 0.8, "es": 0.8, "de": 1.0, "fr": 1.0}


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling — the head-language downsampling
    every training-data pipeline runs before mixing a corpus.  Keep a row
    iff hash_frac(doc_id) < rate[lang], where hash_frac is the first 8 hex
    digits of md5 over 2^32: reproducible across engines, runs and
    partitionings (no RNG state), per-stratum rates from a broadcast-able
    literal map, and a doc keeps/loses membership stably as rates change.
    (Spark's df.sampleBy is seed-stable but partitioning-dependent; a
    content-hash threshold is the corpus-scale idiom.)"""
    d = _t(spark, sf_dir, "documents")
    hash_frac = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                    1, 8), 16, 10)
                 .cast("long") / F.lit(_HASH_DENOM))
    rate = None
    for lang, r in SAMPLE_RATES.items():
        rate = (F.when(F.col("lang") == lang, F.lit(r)) if rate is None
                else rate.when(F.col("lang") == lang, F.lit(r)))
    rate = rate.otherwise(F.lit(0.05))
    return (d.withColumn("_hf", hash_frac)
            .where(F.col("_hf") < rate)
            .select("doc_id", "lang", "source",
                    F.round("_hf", 6).alias("hash_frac")))


def _sql_stratified() -> str:
    whens = "\n            ".join(
        f"WHEN lang = '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items())
    return f"""
WITH h AS (
  SELECT doc_id, lang, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           / {_HASH_DENOM} AS hf,
         CASE {whens}
              ELSE 0.05 END AS rate
  FROM documents)
SELECT doc_id, lang, source, ROUND(hf, 6) AS hash_frac
FROM h WHERE hf < rate
"""


SQL_STRATIFIED_SAMPLE = _sql_stratified()


def q_repair_rescore(spark, sf_dir):
    """R1-R7 repair-family graft, demo form: documents failing a quality
    rule (short text / low alpha ratio) get the engine's normalization
    repair (control chars -> space, ASCII-whitespace-run collapse, trim)
    and are re-evaluated; status = KEPT (never failed) / REPAIRED (passes
    after normalization) / DROPPED (repair can't save it).  Same
    normalization expression as engine/operators/repair.py."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(t, "[\\x00-\\x1F\\x7F]", " "),
        "[ \\t\\n\\x0B\\f\\r]+", " "))

    def _fails(c):
        n_alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
        return (F.length(c) < 40) | \
            (n_alpha.cast("double") / F.length(c) < 0.6)

    status = (F.when(~_fails(t), "KEPT")
              .when(~_fails(norm), "REPAIRED")
              .otherwise("DROPPED"))
    final = F.when(_fails(t), norm).otherwise(t)
    return d.select("doc_id", status.alias("status"),
                    F.length(final).alias("n_chars_final"))


SQL_REPAIR_RESCORE = r"""
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
                             '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS norm
  FROM documents),
ev AS (
  SELECT doc_id, text, norm,
         (LENGTH(text) < 40 OR
          CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / LENGTH(text) < 0.6) AS fail_raw,
         (LENGTH(norm) < 40 OR
          CAST(LENGTH(regexp_replace(norm, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
            / LENGTH(norm) < 0.6) AS fail_norm
  FROM n)
SELECT doc_id,
       CASE WHEN NOT fail_raw THEN 'KEPT'
            WHEN NOT fail_norm THEN 'REPAIRED'
            ELSE 'DROPPED' END AS status,
       LENGTH(CASE WHEN fail_raw THEN norm ELSE text END) AS n_chars_final
FROM ev
"""


def _simhash_bit(j: int):
    """Bit j (0..15) of md5(tok), via hex-digit position arithmetic that is
    expressible identically in Spark SQL and DuckDB (no engine-specific
    integer-conv function needed)."""
    hexpos = j // 4 + 1
    div = 1 << (3 - (j % 4))
    v = F.expr(f"instr('0123456789abcdef', substr(md5(tok), {hexpos}, 1)) - 1")
    return (F.floor(v / F.lit(div)).cast("bigint") % 2)


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup: 16-bit simhash over the distinct-token set
    (per-bit +1/-1 vote weighted by token presence), split into two 8-bit
    half-bands; report half-band buckets holding >1 doc (the candidate
    set a verify pass would rescreen).  At 10^12 rows the band key is the
    shuffle key and each bucket stays small — same scale shape as the
    clips near-dup stage (engine/operators/dedup.py)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.array_distinct(
        F.split(F.col("text"), r"\s+"))).alias("tok"))
    sums = toks.groupBy("doc_id").agg(
        *[F.sum(F.when(_simhash_bit(j) == 1, 1).otherwise(-1)).alias(f"s{j}")
          for j in range(16)])
    sh = sums.select("doc_id", F.concat(
        *[F.when(F.col(f"s{j}") >= 0, F.lit("1")).otherwise(F.lit("0"))
          for j in range(16)]).alias("simhash"))
    bands = (sh.select("doc_id", F.lit("hi").alias("band_no"),
                       F.substring("simhash", 1, 8).alias("band_key"))
             .unionByName(sh.select("doc_id", F.lit("lo").alias("band_no"),
                                    F.substring("simhash", 9, 8).alias("band_key"))))
    return (bands.groupBy("band_no", "band_key")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("canonical_doc"))
            .where(F.col("n_docs") > 1))


def _sql_simhash() -> str:
    bits = []
    for j in range(16):
        hexpos = j // 4 + 1
        div = 1 << (3 - (j % 4))
        bits.append(
            f"SUM(CASE WHEN (CAST(FLOOR((strpos('0123456789abcdef', "
            f"substr(md5(tok), {hexpos}, 1)) - 1) / {div}.0) AS BIGINT) % 2) = 1 "
            f"THEN 1 ELSE -1 END) AS s{j}")
    simhash = "||".join(
        f"(CASE WHEN s{j} >= 0 THEN '1' ELSE '0' END)" for j in range(16))
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
  FROM documents),
sums AS (SELECT doc_id, {', '.join(bits)} FROM toks GROUP BY doc_id),
sh AS (SELECT doc_id, {simhash} AS simhash FROM sums),
bands AS (
  SELECT doc_id, 'hi' AS band_no, substr(simhash, 1, 8) AS band_key FROM sh
  UNION ALL
  SELECT doc_id, 'lo' AS band_no, substr(simhash, 9, 8) AS band_key FROM sh)
SELECT band_no, band_key, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
FROM bands GROUP BY 1, 2 HAVING COUNT(*) > 1
"""


SQL_DEDUP_SIMHASH = _sql_simhash()


QUERIES = {
    "text_features": q_text_features,
    "dedup_simhash": q_dedup_simhash,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "repair_rescore": q_repair_rescore,
    "stratified_sample": q_stratified_sample,
    "vocab_topk": q_vocab_topk,
    "report_rollup": q_report_rollup,
    "distinct_kmv": q_distinct_kmv,
    "doc_winnow_fingerprint": q_doc_winnow_fingerprint,
}

ORACLE_SQL = {
    "doc_winnow_fingerprint": SQL_DOC_WINNOW_FINGERPRINT,
    "vocab_topk": SQL_VOCAB_TOPK,
    "report_rollup": SQL_REPORT_ROLLUP,
    "distinct_kmv": SQL_DISTINCT_KMV,
    "repair_rescore": SQL_REPAIR_RESCORE,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "text_features": SQL_TEXT_FEATURES,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
}

"""DuckDB oracle SQL generators for the pipeline operators.

Each function returns ANSI-ish SQL that DuckDB runs over the driver's
pre-registered parquet views, reproducing the Spark implementation
bit-for-bit (integer metrics, md5-family hashes, IEEE double arithmetic —
see the matching modules in kausaldb_spark.functions / sources for why each
output is engine-portable).
"""

from __future__ import annotations

from kausaldb_spark.functions.dedup import (
    DUCK_CORPUS,
    EXACT_COPY_MOD,
    EXACT_COPY_OFFSET,
    MAX_LSH_BUCKET,
    MAX_SIMHASH_HAMMING,
    NEAR_COPY_MOD,
    NEAR_COPY_OFFSET,
    RARE_SHINGLE_DF,
)
from kausaldb_spark.functions.text import N_SIMHASH_BANDS
from kausaldb_spark.functions.text import LANG_STOPWORDS

# tokenized corpus + distinct (doc, 3-shingle) relation
_TOK_SH = (
    DUCK_CORPUS
    + r""",
tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM corpus),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [] ELSE
      list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS shingle
    FROM tok)
)
"""
)

# n_inter / n_a / n_b are SET cardinalities of the 60-bit md5-prefix
# HASHED shingle sets — the identical hash arithmetic the Spark side
# runs (r11, see dedup.jaccard_verify): even a theoretical within-doc
# collision yields the same counts on both engines
_VERIFY_CTES = """
shh AS (SELECT DISTINCT doc_id,
               ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS h
        FROM sh),
sizes AS (SELECT doc_id, count(*) n_sh FROM shh GROUP BY doc_id),
inter AS (SELECT c.doc_a, c.doc_b, count(*) n_inter FROM cands c
          JOIN shh x ON x.doc_id = c.doc_a
          JOIN shh y ON y.doc_id = c.doc_b AND y.h = x.h
          GROUP BY c.doc_a, c.doc_b),
verified AS (
  SELECT i.doc_a, i.doc_b, CAST(n_inter AS BIGINT) AS n_inter,
         CAST(sa.n_sh + sb.n_sh - n_inter AS BIGINT) AS n_union
  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
               JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE n_inter * {den} >= (sa.n_sh + sb.n_sh - n_inter) * {num})
"""

_VERIFY = _VERIFY_CTES + "\nSELECT * FROM verified"


def exact_dedup_sql() -> str:
    return (
        "WITH "
        + DUCK_CORPUS
        + """
SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_dups,
       min(doc_id) AS min_doc_id
FROM corpus GROUP BY md5(text) HAVING count(*) > 1"""
    )


def _sigs_cte(n_hashes: int = 8) -> str:
    """The v2 signature CTE (dedup.MINHASH_SIG_VERSION): one md5 per
    shingle, per-seed universal mix ((c0 mod P) * A_k + c1 mod P) mod P —
    the SAME integer arithmetic the Spark side runs; the seed constants
    are imported so the two can never drift."""
    from kausaldb_spark.functions.dedup import MIX_A, MIX_P

    seed_rows = ", ".join(
        f"({k}, {MIX_A[k]}::BIGINT)" for k in range(n_hashes)
    )
    return f"""
sigs AS (
  SELECT doc_id, k,
         min(((('0x' || substring(md5(shingle), 1, 11))::BIGINT % {MIX_P})
              * a
              + ('0x' || substring(md5(shingle), 12, 11))::BIGINT % {MIX_P})
             % {MIX_P}) AS minh
  FROM sh CROSS JOIN (VALUES {seed_rows}) seeds(k, a)
  GROUP BY doc_id, k
),"""


def _minhash_ctes(num: int = 7, den: int = 10, n_hashes: int = 8, band: int = 2) -> str:
    return (
        _TOK_SH
        + ","
        + _sigs_cte(n_hashes)
        + f"""
bands AS (
  SELECT doc_id, k // {band} AS band,
         md5(array_to_string(list_sort(list(minh)), '|')) AS bucket
  FROM sigs GROUP BY doc_id, k // {band}
),
elig AS (SELECT band, bucket FROM bands GROUP BY band, bucket
         HAVING count(*) <= {MAX_LSH_BUCKET}),
cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN elig e ON a.band = e.band AND a.bucket = e.bucket
          JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
"""
        + _VERIFY_CTES.format(num=num, den=den)
    )


def minhash_sql(num: int = 7, den: int = 10, n_hashes: int = 8, band: int = 2) -> str:
    return "WITH " + _minhash_ctes(num, den, n_hashes, band) + "\nSELECT * FROM verified"


def incremental_dedup_sql(num: int = 7, den: int = 10, n_hashes: int = 8,
                          band: int = 2) -> str:
    """near_dup_vs_corpus oracle: base documents = the corpus, the planted
    copies (offset ids) = the incoming batch. Candidate generation is
    cross-only with the bucket cap on the CORPUS side (counts over corpus
    bands, not the union) — exactly the incremental path's semantics.
    Output columns follow the op: doc_a = new id, doc_b = corpus id."""
    return (
        "WITH "
        + _TOK_SH
        + ","
        + _sigs_cte(n_hashes)
        + f"""
bands AS (
  SELECT doc_id, k // {band} AS band,
         md5(array_to_string(list_sort(list(minh)), '|')) AS bucket
  FROM sigs GROUP BY doc_id, k // {band}
),
cbands AS (SELECT * FROM bands WHERE doc_id < {EXACT_COPY_OFFSET}),
nbands AS (SELECT * FROM bands WHERE doc_id >= {EXACT_COPY_OFFSET}),
elig AS (SELECT band, bucket FROM cbands GROUP BY band, bucket
         HAVING count(*) <= {MAX_LSH_BUCKET}),
cands AS (SELECT DISTINCT n.doc_id AS doc_a, c.doc_id AS doc_b
          FROM nbands n JOIN elig e ON n.band = e.band AND n.bucket = e.bucket
          JOIN cbands c ON c.band = n.band AND c.bucket = n.bucket),
"""
        + _VERIFY_CTES.format(num=num, den=den)
        + "\nSELECT * FROM verified"
    )


def near_dup_clusters_sql(num: int = 7, den: int = 10) -> str:
    """MinHash pairs → undirected closure → per-doc min-id component label →
    canonical flag. The recursive closure is bounded by component size
    (near-dup clusters are tiny)."""
    return (
        "WITH RECURSIVE "
        + _minhash_ctes(num, den)
        + """,
und AS (SELECT doc_a AS a, doc_b AS b FROM verified
        UNION ALL SELECT doc_b, doc_a FROM verified),
nodes AS (SELECT DISTINCT a AS doc FROM und),
rec AS (
  SELECT doc, doc AS comp FROM nodes
  UNION
  SELECT u.b AS doc, r.comp FROM rec r JOIN und u ON u.a = r.doc
),
clusters AS (SELECT doc AS doc_id, min(comp) AS cluster_id FROM rec GROUP BY doc)
SELECT doc_id, cluster_id, CAST(doc_id = cluster_id AS INT) AS is_canonical
FROM clusters"""
    )


def ngram_jaccard_sql(num: int = 5, den: int = 10, min_shared: int = 2) -> str:
    return (
        "WITH "
        + _TOK_SH
        + f""",
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {RARE_SHINGLE_DF}),
cands AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM sh x JOIN rare r ON x.shingle = r.shingle
          JOIN sh y ON y.shingle = x.shingle AND x.doc_id < y.doc_id
          GROUP BY x.doc_id, y.doc_id HAVING count(*) >= {min_shared}),
"""
        + _VERIFY.format(num=num, den=den)
    )


def curation_sql(num: int = 7, den: int = 10, benchmark_max_id: int = 10) -> str:
    """End-to-end curation report oracle: quality + language + canonical
    near-dup + decontamination + split, over the BASE documents table (the
    planted-dup corpus is only for dedup unit parity)."""
    base = "\ncorpus AS (SELECT doc_id, text FROM documents)\n"
    chain = _minhash_ctes(num, den).replace(DUCK_CORPUS, base)
    score_cols = ", ".join(
        f"len(list_filter(t, x -> x IN ({', '.join(repr(w) for w in words)}))) AS s_{lang}"
        for lang, words in LANG_STOPWORDS.items()
    )
    mx = "greatest(" + ", ".join(f"s_{la}" for la in LANG_STOPWORDS) + ")"
    bucket = "('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))::BIGINT % 100"
    bm = benchmark_max_id
    return (
        "WITH RECURSIVE "
        + chain
        + f""",
und AS (SELECT doc_a AS a, doc_b AS b FROM verified
        UNION ALL SELECT doc_b, doc_a FROM verified),
nodes AS (SELECT DISTINCT a AS doc FROM und),
rec AS (SELECT doc, doc AS comp FROM nodes
        UNION SELECT u.b, r.comp FROM rec r JOIN und u ON u.a = r.doc),
non_canonical AS (SELECT doc AS doc_id FROM rec GROUP BY doc HAVING doc != min(comp)),
sh8 AS (SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id, unnest(CASE WHEN len(t) < 8 THEN [] ELSE
    list_transform(generate_series(1, len(t) - 7),
                   i -> array_to_string(t[i:i+7], ' ')) END) AS shingle FROM tok)),
bench AS (SELECT doc_id AS benchmark_id, shingle FROM sh8 WHERE doc_id < {bm}),
contaminated AS (
  SELECT DISTINCT doc_id FROM (
    SELECT s.doc_id, b.benchmark_id FROM sh8 s JOIN bench b ON b.shingle = s.shingle
    WHERE s.doc_id >= {bm} GROUP BY s.doc_id, b.benchmark_id HAVING count(*) >= 2)),
metrics AS (
  SELECT doc_id, len(t) AS n_tokens,
         floor(list_sum(list_transform(t, x -> length(x))) * 100 / len(t)) AS avg_len,
         len(list_distinct(t)) AS n_distinct,
         {score_cols}
  FROM tok),
curated AS (
  SELECT m.doc_id, m.n_tokens FROM metrics m
  WHERE m.n_tokens BETWEEN 10 AND 100000
    AND m.avg_len BETWEEN 200 AND 1500
    AND m.n_distinct * 4 >= m.n_tokens
    AND {mx} > 0
    AND m.doc_id >= {bm}
    AND m.doc_id NOT IN (SELECT doc_id FROM non_canonical)
    AND m.doc_id NOT IN (SELECT doc_id FROM contaminated))
SELECT CASE WHEN {bucket} < 5 THEN 'val'
            WHEN {bucket} < 10 THEN 'test'
            ELSE 'train' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM curated GROUP BY 1"""
    )


def _simhash_expr(tokens_col: str = "t", salt: str = "") -> str:
    md5_arg = f"'{salt}' || tk" if salt else "tk"
    terms = []
    for j in range(16):
        terms.append(
            f"(CASE WHEN list_sum(list_transform({tokens_col}, tk -> CASE WHEN "
            f"contains('89abcdef', substr(md5({md5_arg}), {j + 1}, 1)) THEN 1 ELSE -1 END)) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS INT)"


def simhash_pairs_sql() -> str:
    return (
        "WITH "
        + DUCK_CORPUS
        + rf""",
tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM corpus),
sims AS (SELECT doc_id, {_simhash_expr()} AS sh FROM tok)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS simhash
FROM sims a JOIN sims b ON a.sh = b.sh AND a.doc_id < b.doc_id"""
    )


def _simhash64_band_expr(b: int, tokens_col: str = "t") -> str:
    """Band b of the one-md5-per-token 64-bit SimHash: signature bit
    j = 16b + jb uses bit (j mod 2) of hex nibble (j div 2)."""
    terms = []
    for jb in range(16):
        j = 16 * b + jb
        pos, shift = j // 2 + 1, j % 2
        v = f"(strpos('0123456789abcdef', substr(md5(tk), {pos}, 1)) - 1)"
        bit = f"(({v} >> {shift}) & 1)"
        terms.append(
            f"(CASE WHEN list_sum(list_transform({tokens_col}, tk -> {bit} * 2 - 1)) >= 0 "
            f"THEN {1 << jb} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS INT)"


def simhash_band_sql(
    max_hamming: int = MAX_SIMHASH_HAMMING, max_bucket: int = MAX_LSH_BUCKET
) -> str:
    """64-bit banded SimHash oracle: 4 bands of the single-md5 signature,
    per-band candidate union (bucket-capped), bit_count-verified hamming
    distance."""
    band_cols = ", ".join(
        f"{_simhash64_band_expr(b)} AS b{b}" for b in range(N_SIMHASH_BANDS)
    )
    # hamming = sum of per-band 16-bit hammings (same no-packing formulation
    # as the Spark side — packing band 3 into bits 48-63 would overflow
    # signed int64)
    hamming = " + ".join(
        f"bit_count(xor(sa.b{b}, sb.b{b}))" for b in range(N_SIMHASH_BANDS)
    )
    per_band = "\nUNION\n".join(
        f"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sims a JOIN sims b ON a.b{b} = b.b{b} AND a.doc_id < b.doc_id
    WHERE a.b{b} IN (SELECT b{b} FROM sims GROUP BY b{b} HAVING count(*) <= {max_bucket})"""
        for b in range(N_SIMHASH_BANDS)
    )
    return (
        "WITH "
        + DUCK_CORPUS
        + rf""",
tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM corpus),
sims AS (SELECT doc_id, {band_cols} FROM tok),
cand AS ({per_band})
SELECT c.doc_a, c.doc_b, CAST({hamming} AS INT) AS hamming
FROM cand c JOIN sims sa ON sa.doc_id = c.doc_a
            JOIN sims sb ON sb.doc_id = c.doc_b
WHERE {hamming} <= {max_hamming}"""
    )


def lang_id_sql() -> str:
    scores = []
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        scores.append(
            f"len(list_filter(t, x -> x IN ({lst}))) AS s_{lang}"
        )
    order = list(LANG_STOPWORDS)
    mx = "greatest(" + ", ".join(f"s_{la}" for la in order) + ")"
    case = "CASE WHEN " + mx + " = 0 THEN 'und' "
    for la in order:
        case += f"WHEN s_{la} = {mx} THEN '{la}' "
    case += "END"
    return (
        r"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
scored AS (SELECT doc_id, """
        + ", ".join(scores)
        + f" FROM tok) SELECT doc_id, {case} AS pred_lang FROM scored"
    )


def stratified_sample_sql(per_class: int = 50) -> str:
    """lang_id labeling + per-class md5-ordered cap (same window spec as the
    Spark side, so the kept set is identical)."""
    scores = []
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        scores.append(f"len(list_filter(t, x -> x IN ({lst}))) AS s_{lang}")
    order = list(LANG_STOPWORDS)
    mx = "greatest(" + ", ".join(f"s_{la}" for la in order) + ")"
    case = "CASE WHEN " + mx + " = 0 THEN 'und' "
    for la in order:
        case += f"WHEN s_{la} = {mx} THEN '{la}' "
    case += "END"
    return (
        r"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
scored AS (SELECT doc_id, """
        + ", ".join(scores)
        + f"""
 FROM tok),
labeled AS (SELECT doc_id, {case} AS pred_lang FROM scored),
ranked AS (
  SELECT doc_id, pred_lang,
         row_number() OVER (PARTITION BY pred_lang
                            ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rnk
  FROM labeled)
SELECT doc_id, pred_lang FROM ranked WHERE rnk <= {per_class}"""
    )


def quality_sql() -> str:
    return r"""
WITH tok AS (SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
m AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(t) AS INT) AS n_tokens,
         CAST(floor(list_sum(list_transform(t, x -> length(x))) * 100 / len(t)) AS BIGINT) AS avg_token_len_x100,
         CAST(floor(len(list_filter(t, x -> x IN ('the','and','of','to','in'))) * 100 / len(t)) AS BIGINT) AS pct_stopwords,
         CAST(len(list_distinct(t)) AS INT) AS n_distinct_tokens
  FROM tok)
SELECT *,
       CAST(n_tokens >= 10 AND n_tokens <= 100000
            AND avg_token_len_x100 BETWEEN 200 AND 1500
            AND n_distinct_tokens * 4 >= n_tokens AS INT) AS is_quality
FROM m"""


def pii_scan_sql() -> str:
    from kausaldb_spark.functions.text import PII_EMAIL, PII_PHONE, PII_URL

    red = "text"
    for pat, tok in ((PII_EMAIL, "<EMAIL>"), (PII_URL, "<URL>"), (PII_PHONE, "<PHONE>")):
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_URL}')) AS INT) AS n_urls,
       CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INT) AS n_phones,
       md5({red}) AS redacted_hash
FROM documents"""


def repetition_sql() -> str:
    """Gopher-style repetition signal: most-frequent word 2-gram share."""
    return r"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
g AS (
  SELECT doc_id, unnest(CASE WHEN len(t) < 2 THEN [] ELSE
    list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1]) END) AS gram
  FROM tok),
per AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
       CAST(max(c) AS BIGINT) AS top2_count,
       CAST(floor(max(c) * 100 / sum(c)) AS BIGINT) AS top2_frac_x100
FROM per GROUP BY doc_id"""


def fingerprint_sql(n: int = 5, k: int = 4) -> str:
    return rf"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
sh AS (SELECT doc_id,
         CASE WHEN len(t) < {n} THEN [] ELSE
           list_transform(generate_series(1, len(t) - {n - 1}),
                          i -> array_to_string(t[i:i + {n - 1}], ' ')) END AS shingles
       FROM tok)
SELECT doc_id,
       array_to_string(list_sort(list_transform(shingles, s -> md5(s)))[1:{k}], '|') AS fp
FROM sh"""


_QUANT = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"


def _sign_bucket_expr(n_bits: int = 8) -> str:
    terms = [
        f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)" for j in range(n_bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"


def ann_topk_sql(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS query_id, {_QUANT} AS qv FROM embeddings WHERE vec_id IN ({ids})),
c AS (SELECT vec_id AS neighbor_id, {_QUANT} AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, CAST(list_dot_product(qv, cv) AS BIGINT) AS dot
  FROM q CROSS JOIN c WHERE query_id != neighbor_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM scored)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, dot FROM ranked WHERE rnk <= {k}"""


def ann_lsh_sql(query_ids: list[int], k: int = 5, n_bits: int = 8) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH e AS (SELECT vec_id, {_QUANT} AS v, {_sign_bucket_expr(n_bits)} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qv, c.v) AS BIGINT) AS dot
  FROM q JOIN e c ON c.bucket = q.bucket AND c.vec_id != q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
  FROM scored)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, dot FROM ranked WHERE rnk <= {k}"""


def ann_recall_sql(query_ids: list[int], k: int = 5, n_bits: int = 8) -> str:
    """Twin of similarity.lsh_recall: the ann_topk and ann_lsh rank CTEs
    (identical formulas/tie-breaks as their own gated twins) intersected
    per query; recall_ppm in exact integer division."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH e AS (SELECT vec_id, {_QUANT} AS v, {_sign_bucket_expr(n_bits)} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id IN ({ids})),
xs AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.qv, c.v) DESC, c.vec_id) AS rnk
    FROM q CROSS JOIN e c WHERE c.vec_id != q.query_id
  ) WHERE rnk <= {k}
), ap AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.qv, c.v) DESC, c.vec_id) AS rnk
    FROM q JOIN e c ON c.bucket = q.bucket AND c.vec_id != q.query_id
  ) WHERE rnk <= {k}
), napx AS (
  SELECT query_id, CAST(count(*) AS INT) AS n_approx FROM ap GROUP BY query_id
), agg AS (
  SELECT xs.query_id,
         CAST(count(*) AS INT) AS n_exact,
         CAST(sum(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_hit
  FROM xs LEFT JOIN ap
    ON ap.query_id = xs.query_id AND ap.neighbor_id = xs.neighbor_id
  GROUP BY xs.query_id
)
SELECT a.query_id, a.n_exact,
       CAST(coalesce(n.n_approx, 0) AS INT) AS n_approx, a.n_hit,
       CAST((a.n_hit::BIGINT * 1000000) // a.n_exact AS BIGINT) AS recall_ppm
FROM agg a LEFT JOIN napx n ON n.query_id = a.query_id"""


def embedding_near_dup_sql(min_dot: int, n_bits: int = 8) -> str:
    return f"""
WITH e AS (SELECT vec_id, {_QUANT} AS v, {_sign_bucket_expr(n_bits)} AS bucket FROM embeddings),
ec AS (SELECT e.* FROM e WHERE e.bucket IN
       (SELECT bucket FROM e GROUP BY bucket HAVING count(*) <= {MAX_LSH_BUCKET}))
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(list_dot_product(a.v, b.v) AS BIGINT) AS dot
FROM ec a JOIN ec b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) >= {min_dot}"""


def events_asof_sql(left_type: str = "purchase", right_type: str = "view") -> str:
    """Window twin of events.asof_join (same union-stream ordering, so the
    tie-break — right-before-left at equal us, greatest event_id — is
    identical)."""
    return f"""
WITH ev AS (SELECT event_id, epoch_us(ts) AS us, user_id, event_type FROM events
            WHERE event_type IN ('{left_type}', '{right_type}')),
u AS (SELECT event_id, us, user_id,
             CAST(event_type = '{right_type}' AS INT) AS is_r FROM ev),
carried AS (
  SELECT *,
         last_value(CASE WHEN is_r = 1 THEN us END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY us, is_r DESC, event_id
            ROWS UNBOUNDED PRECEDING) AS view_us,
         last_value(CASE WHEN is_r = 1 THEN event_id END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY us, is_r DESC, event_id
            ROWS UNBOUNDED PRECEDING) AS view_id
  FROM u)
SELECT event_id AS purchase_id, user_id, us AS p_us,
       CAST(coalesce(view_id, -1) AS BIGINT) AS view_id,
       CAST(coalesce(view_us, -1) AS BIGINT) AS view_us,
       CAST(coalesce(us - view_us, -1) AS BIGINT) AS gap_us
FROM carried WHERE is_r = 0"""


def events_hourly_sql() -> str:
    return """
SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2"""


def sessionize_sql(gap_us: int) -> str:
    return f"""
WITH ev AS (SELECT event_id, epoch_us(ts) AS us, user_id FROM events),
flagged AS (
  SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > {gap_us}
                 THEN 1 ELSE 0 END AS new_session
  FROM ev),
sess AS (
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged)
SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(us) - min(us) AS BIGINT) AS duration_us, min(us) AS first_us
FROM sess GROUP BY 1, 2"""


def canonical_selection_sql(num: int = 7, den: int = 10) -> str:
    """Quality-weighted canonical per near-dup cluster: highest token count
    wins, ties to min doc_id (the oracle twin of dedup.select_canonical over
    near_dup_clusters + a token-count score)."""
    return (
        "WITH RECURSIVE "
        + _minhash_ctes(num, den)
        + r""",
und AS (SELECT doc_a AS a, doc_b AS b FROM verified
        UNION ALL SELECT doc_b, doc_a FROM verified),
nodes AS (SELECT DISTINCT a AS doc FROM und),
rec AS (
  SELECT doc, doc AS comp FROM nodes
  UNION
  SELECT u.b AS doc, r.comp FROM rec r JOIN und u ON u.a = r.doc
),
clusters AS (SELECT doc AS doc_id, min(comp) AS cluster_id FROM rec GROUP BY doc),
scored AS (
  SELECT c.doc_id, c.cluster_id,
         CAST(len(string_split_regex(trim(lower(t.text)), '\s+')) AS BIGINT) AS score
  FROM clusters c JOIN corpus t USING (doc_id)),
best AS (SELECT cluster_id, max(score) AS best_score FROM scored GROUP BY 1),
bestid AS (
  SELECT s.cluster_id, min(s.doc_id) AS best_id
  FROM scored s JOIN best b
    ON s.cluster_id = b.cluster_id AND s.score = b.best_score
  GROUP BY 1)
SELECT s.doc_id, s.cluster_id, s.score,
       CAST(s.doc_id = bi.best_id AS INT) AS is_canonical
FROM scored s JOIN bestid bi ON s.cluster_id = bi.cluster_id"""
    )

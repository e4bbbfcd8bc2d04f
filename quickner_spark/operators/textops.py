"""Text analytics + deduplication operators for training-data pipelines.

All hot paths are JVM-side (built-in functions inside whole-stage codegen);
no Python UDFs anywhere in this module. Columns are integer-typed where the
results feed exact-match verification.

Scale notes:
* exact dedup = hash aggregate on a text digest (never on raw text at 100 TB
  — group on ``xxhash64``/``md5`` so the shuffle carries 16 bytes per row).
* n-gram Jaccard = shingle-inverted-index self-join: shuffle keyed on the
  shingle, so common shingles are the skew risk — ``doc_freq_cap`` drops
  ultra-common shingles (stop-shingles), the standard trick, before the join.
* MinHash/LSH variants (see ``minhash_dedup``) bound candidate pairs at
  planetary scale where exact self-join is too big.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from quickner_spark.operators.caching import track
from quickner_spark.operators.hashing import (
    MIX_M, MIX_P, minhash_mix_constants, portable_hash64, portable_hash64_hi)

__all__ = [
    "token_stats",
    "exact_dup_groups",
    "shingle_sets",
    "word_shingles",
    "jaccard_pairs",
    "jaccard_pairs_prefix",
    "dup_clusters",
    "minhash_signatures",
    "minhash_dedup",
    "repeated_blocks",
    "simhash64",
    "fingerprint",
    "lang_id",
]

_DEFAULT_STOPWORDS = ("the", "a", "an", "of", "and", "to", "in")

# Minimal per-language stopword profiles for the n-gram/stopword heuristic.
# Real deployments swap richer profiles; the operator shape is the point.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "von", "zu", "ist"),
    "fr": ("le", "la", "et", "de", "un", "est", "dans"),
    "es": ("el", "la", "y", "de", "un", "es", "en"),
}


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  stopwords: tuple[str, ...] = _DEFAULT_STOPWORDS) -> DataFrame:
    """Document quality heuristics (training-data filtering): length,
    punctuation ratio, stopword ratio, distinct-token ratio, and a
    composite 0..100 integer score. Integer/percent outputs so results are
    exact across engines."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_chars = F.length(text_col).cast("long")
    n_punct = (n_chars - F.length(F.regexp_replace(
        text_col, r"[!-/:-@\[-`{-~]", ""))).cast("long")
    # floor division everywhere: double->int CASTs round differently across
    # engines (Spark truncates, DuckDB rounds) — floor is unambiguous.
    pct = lambda num, den: F.when(
        den > 0, F.floor(F.lit(100) * num / den).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    stop_pct = pct(n_stop, n_tok)
    distinct_pct = pct(n_distinct, n_tok)
    punct_pct = pct(n_punct, n_chars)
    # coalesce: NULL text must score length_ok=0 (a NULL here would
    # poison the composite into NULL instead of the no-signal base)
    length_ok = F.coalesce((n_chars >= 50) & (n_chars <= 100_000),
                           F.lit(False)).cast("long")
    # composite: reward stopword presence (fluency), lexical diversity,
    # low punctuation noise, sane length
    score = (F.least(stop_pct * 2, F.lit(30).cast("long"))
             + F.least(F.floor(distinct_pct / 2).cast("long"),
                       F.lit(40).cast("long"))
             + F.greatest(F.lit(20).cast("long") - punct_pct,
                          F.lit(0).cast("long"))
             + length_ok * 10)
    return df.select(F.col(id_col), n_chars.alias("n_chars_text"),
                     n_tok.alias("n_tokens"), stop_pct.alias("stop_pct"),
                     distinct_pct.alias("distinct_pct"),
                     punct_pct.alias("punct_pct"),
                     score.alias("quality"))


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            profiles: dict[str, tuple[str, ...]] | None = None) -> DataFrame:
    """Stopword-profile language ID: per language count profile-token hits;
    argmax with deterministic tie-break (language code asc); 'und'
    (undetermined) when nothing hits. Pure JVM columns."""
    profiles = profiles or LANG_PROFILES
    toks = F.split(F.lower(F.col(text_col)), " ")
    scores = []
    for code, words in sorted(profiles.items()):
        # NB: a one-parameter lambda only — a second parameter would make
        # F.filter pass the element index into it.
        word_arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(word_arr, t)))
        scores.append(F.struct(hits.cast("long").alias("hits"),
                               F.lit(code).alias("code")))
    # argmax by (hits desc, code asc): array_max on struct(hits, negated
    # order) is awkward — use aggregate over the struct array instead.
    best = F.aggregate(
        F.array(*scores),
        F.struct(F.lit(-1).cast("long").alias("hits"),
                 F.lit("").alias("code")),
        lambda acc, s: F.when(s["hits"] > acc["hits"], s).otherwise(acc),
    )
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))
        .alias("lang_guess"),
        # NULL text -> ('und', NULL): without the guard the aggregate's
        # -1 init value leaks (every NULL-vs-acc comparison keeps acc).
        F.when(F.col(text_col).isNotNull(), best["hits"])
        .alias("lang_hits"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                stopwords: tuple[str, ...] = _DEFAULT_STOPWORDS) -> DataFrame:
    """Per-document token statistics (quality-scoring inputs): token count,
    distinct-token count, stopword count, char count. Whitespace
    tokenization (single space; the corpus generator emits single-spaced
    text — mirror in oracles)."""
    toks = F.split(F.col(text_col), " ")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        .cast("long").alias("n_stopwords"),
        F.length(text_col).cast("long").alias("n_chars_text"),
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: digest -> (keep_id, n_copies). Groups by
    md5(text) so the shuffle key is fixed-width; ``keep_id`` = min id is the
    canonical survivor (deterministic)."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
            .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
            .where(F.col("n_copies") > 1))


def word_shingles(df: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) pairs: distinct word n-grams per document. Built with
    ``transform(sequence(...))`` — pure JVM, no UDF, no join."""
    return (shingle_sets(df, n, text_col, id_col)
            .select(id_col, F.explode("sh_set").alias("shingle")))


def jaccard_pairs(df: DataFrame, n: int = 3, threshold_pct: int = 80,
                  text_col: str = "text", id_col: str = "doc_id",
                  doc_freq_cap: int | None = None) -> DataFrame:
    """Near-duplicate pairs by exact word-n-gram Jaccard >= threshold_pct/100.

    Inverted-index self-join: pairs sharing >=1 shingle are candidates; the
    Jaccard test is pure integer arithmetic
    (``100*shared >= pct*(|A|+|B|-shared)``) so results are exact and
    hash-comparable. ``doc_freq_cap`` drops shingles appearing in more than
    that many docs before the join (skew guard; alters recall only for pairs
    whose every shared shingle is ultra-common).

    The join/aggregate key is ``xxhash64(shingle)`` — an 8-byte fixed-width
    shuffle key instead of the raw n-gram string (which at web scale
    averages tens of bytes). Distinct-shingle counts are preserved up to
    64-bit hash collisions (~p²/2^65 for p distinct shingles per doc —
    negligible against the threshold integer arithmetic)."""
    sh = (word_shingles(df, n, text_col, id_col)
          .select(id_col, F.xxhash64("shingle").alias("shingle")))
    if doc_freq_cap is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        sh = (sh.join(F.broadcast(freq.where(F.col("df") > doc_freq_cap)),
                      "shingle", "left_anti"))
    sh = sh.cache()
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (a.join(b, (F.col(f"a.shingle") == F.col(f"b.shingle"))
                     & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
              .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                       F.col(f"b.{id_col}").alias("doc_b"))
              .agg(F.count("*").alias("shared")))
    ca = counts.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n_sh", "n_a")
    cb = counts.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n_sh", "n_b")
    return track((shared.join(ca, "doc_a").join(cb, "doc_b")
                  .where(F.lit(100) * F.col("shared")
                         >= F.lit(threshold_pct)
                         * (F.col("n_a") + F.col("n_b") - F.col("shared")))
                  .select("doc_a", "doc_b", "shared", "n_a", "n_b")), sh)


def jaccard_pairs_prefix(df: DataFrame, n: int = 3, threshold_pct: int = 80,
                         text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact word-n-gram Jaccard pairs via PREFIX FILTERING (AllPairs /
    PPJoin family) — same output as :func:`jaccard_pairs`, asymptotically
    smaller candidate set.

    If J(A, B) >= t then, ordering both sets by a global order (the shingle
    hash), A and B must share at least one element among each one's first
    ``|X| - ceil(t * |X|) + 1`` elements — otherwise their intersection is
    too small. So only the PREFIX of each document's sorted shingle-hash
    array enters the inverted index; the candidate join is prefix x prefix
    instead of full x full (at threshold 0.8 the prefix is ~20% of the
    set, so candidate volume drops ~25x on the quadratic term, and common
    shingles that sit late in the global order never generate pairs at
    all). Candidates are then verified exactly with an in-row
    ``array_intersect`` over the full sets. Differentially tested equal to
    ``jaccard_pairs`` (tests/test_textops.py)."""
    sets = (shingle_sets(df, n, text_col, id_col)
            .select(F.col(id_col),
                    F.array_sort(F.transform("sh_set", lambda s: F.xxhash64(s)))
                    .alias("hs"))
            .cache())
    size = F.size("hs")
    prefix_len = (size - F.ceil(size * threshold_pct / 100) + 1).cast("int")
    prefix = (sets.select(id_col, size.alias("nsh"),
                          F.explode(F.slice("hs", 1, prefix_len))
                          .alias("ph")))
    # length filter (PPJoin): J(A,B) >= t forces t <= |A|/|B| <= 1/t —
    # prune size-mismatched candidates inside the join, before the verify.
    cand = (prefix.alias("a").join(
        prefix.alias("b"),
        (F.col("a.ph") == F.col("b.ph"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.col("b.nsh") * threshold_pct <= F.col("a.nsh") * 100)
        & (F.col("a.nsh") * threshold_pct <= F.col("b.nsh") * 100))
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"))
        .distinct())
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("hs").alias("hs_b"))
    verified = (cand.join(sa, "doc_a").join(sb, "doc_b")
                .select("doc_a", "doc_b",
                        F.size(F.array_intersect("hs_a", "hs_b")).cast("long")
                        .alias("shared"),
                        F.size("hs_a").cast("long").alias("n_a"),
                        F.size("hs_b").cast("long").alias("n_b")))
    return track((verified
                  .where(F.lit(100) * F.col("shared")
                         >= F.lit(threshold_pct)
                         * (F.col("n_a") + F.col("n_b") - F.col("shared")))
                  .select("doc_a", "doc_b", "shared", "n_a", "n_b")), sets)


def dup_clusters(df: DataFrame, n: int = 3, threshold_pct: int = 80,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate CLUSTER assignment — the dedup decision step of a
    training-data pipeline: pairwise near-dups are not enough, because
    A~B and B~C must drop two of {A, B, C}, not one per pair.

    exact prefix-filtered Jaccard pairs (:func:`jaccard_pairs_prefix`)
    -> undirected connected components -> every document mapped to
    ``(doc_id, cluster_id, keep)`` where ``cluster_id`` = min doc id in
    its duplicate cluster and ``keep`` marks the representative.
    Documents with no near-dup partner form singleton clusters
    (keep = true). Deterministic and hash-independent, so oracle-exact
    (q34: recursive-CTE transitive closure). At corpus scale swap the
    exact pair generator for ``minhash_dedup`` — the clustering step is
    unchanged."""
    from quickner_spark.operators.graph import connected_components

    from quickner_spark.operators.caching import release

    pairs = jaccard_pairs_prefix(df, n=n, threshold_pct=threshold_pct,
                                 text_col=text_col, id_col=id_col)
    cc = connected_components(pairs.select("doc_a", "doc_b"),
                              "doc_a", "doc_b")
    # connected_components materialized the pair list (count / checkpoint),
    # so the shingle cache behind `pairs` is spent — release it; `cc` no
    # longer depends on its lineage.
    release(pairs)
    docs = df.select(F.col(id_col))
    cluster = F.coalesce("component", F.col(id_col))
    return (docs.join(cc.withColumnRenamed("node", id_col), id_col, "left")
            .select(F.col(id_col), cluster.alias("cluster_id"),
                    (cluster == F.col(id_col)).alias("keep")))


def shingle_sets(df: DataFrame, n: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, sh_set): the distinct word n-grams of each document as ONE array
    row — the un-exploded form of :func:`word_shingles`. Zero shuffle; used
    wherever per-document shingle sets are consumed whole (MinHash
    signatures, candidate-pair verification)."""
    ws = F.split(F.col(text_col), " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
    )
    return (df.where(F.size(ws) >= n)
            .select(F.col(id_col), F.array_distinct(shingles).alias("sh_set")))


def minhash_signatures(df: DataFrame, n: int = 3, num_hashes: int = 64,
                       text_col: str = "text", id_col: str = "doc_id",
                       hash_family: str = "xxhash64") -> DataFrame:
    """MinHash signatures over word n-gram shingles, fully JVM-side:
    h_i(s) = xxhash64(s, i); signature_i = min over shingles.

    Computed entirely in-row: the whole signature stage is a narrow map
    with ZERO shuffles — at 100 TB this is one codegen'd pass over the
    scan, vs. the naive explode-to-(doc, i, shingle) shape whose
    intermediate is ``rows x shingles x k`` and costs two hash-aggregate
    shuffles. Each shingle STRING is hashed once (``xxhash64(s)``); the k
    per-permutation hashes re-hash that fixed-width long
    (``xxhash64(h, i)``), so the variable-length string is not re-scanned
    k times — the standard one-hash-plus-k-mixes MinHash construction.

    ``hash_family="portable"`` swaps the per-permutation hashes for the
    md5-derived affine family in :mod:`quickner_spark.operators.hashing`,
    reproducible in any SQL engine — the configuration the DuckDB oracle
    verifies (q14); production stays on xxhash64."""
    sets = shingle_sets(df, n, text_col, id_col)
    return sets.select(F.col(id_col),
                       _minhash_sig(F.col("sh_set"), num_hashes, hash_family)
                       .alias("signature"))


def _minhash_sig(sh_set: Column, num_hashes: int,
                 hash_family: str = "xxhash64") -> Column:
    # Fold over the shingle hashes with an array-of-k-minima accumulator
    # (rather than k outer passes re-hashing the strings): the string array
    # is the aggregate's INPUT, so it is evaluated exactly once per row no
    # matter how Catalyst collapses projections.
    long_max = F.lit(9223372036854775807).cast("long")
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    if hash_family == "portable":
        # h_i(s) = (a_i * (H(s) % 2^30) + b_i) % (2^31-1), H = md5-low-60.
        # Same one-hash-plus-k-mixes shape; the mixes are overflow-safe
        # affine maps so the identical signature is computable in DuckDB.
        a_c, b_c = minhash_mix_constants(num_hashes)
        arr_a = F.array(*[F.lit(a).cast("long") for a in a_c])
        arr_b = F.array(*[F.lit(b).cast("long") for b in b_c])
        return F.aggregate(
            F.transform(sh_set, portable_hash64),
            F.array_repeat(long_max, num_hashes),
            lambda acc, h: F.zip_with(
                acc, idx,
                lambda a, i: F.least(
                    a,
                    (F.element_at(arr_a, i + 1) * (h % F.lit(MIX_M))
                     + F.element_at(arr_b, i + 1)) % F.lit(MIX_P))),
        )
    if hash_family != "xxhash64":
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    return F.aggregate(
        F.transform(sh_set, lambda s: F.xxhash64(s)),
        F.array_repeat(long_max, num_hashes),
        lambda acc, h: F.zip_with(
            acc, idx, lambda a, i: F.least(a, F.xxhash64(h, i.cast("int")))),
    )


def minhash_dedup(df: DataFrame, n: int = 3, num_hashes: int = 64,
                  bands: int = 16, threshold_pct: int = 80,
                  text_col: str = "text", id_col: str = "doc_id",
                  hash_family: str = "xxhash64") -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by exact Jaccard.

    Scale path for dedup: signatures -> band keys -> group by band bucket ->
    candidate pairs -> exact verify. Probabilistic recall (a truly-similar
    pair missed by every band is possible, P ~ (1-s^r)^b); the exact verify
    step makes precision 1.0 relative to ``jaccard_pairs``.

    ``hash_family="portable"`` makes both the signatures and the band
    buckets md5-based (engine-portable) so the full candidate set — and
    therefore the verified output — is reproducible in DuckDB (oracle
    q14). Production default stays xxhash64 (cheaper fixed-width bucket
    key on the shuffle)."""
    rows = num_hashes // bands
    sets = shingle_sets(df, n, text_col, id_col).cache()
    sig = sets.select(id_col, _minhash_sig(F.col("sh_set"), num_hashes,
                                           hash_family).alias("signature"))
    if hash_family == "portable":
        # md5 over "sig[b*r+1..b*r+r] joined by ',' then '|band'" — the
        # exact string DuckDB's array_to_string(...) || '|' || band builds.
        def _bucket(b: int) -> Column:
            return F.md5(F.concat(
                F.concat_ws(",", *[F.element_at("signature", b * rows + r + 1)
                                   for r in range(rows)]),
                F.lit(f"|{b}")))
    else:
        def _bucket(b: int) -> Column:
            return F.xxhash64(F.concat_ws(
                ",", *[F.element_at("signature", b * rows + r + 1)
                       for r in range(rows)]), F.lit(b))
    banded = sig.select(
        id_col,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
            for b in range(bands)
        ])).alias("e"),
    ).select(id_col, "e.band", "e.bucket")
    cand = (banded.alias("x").join(
        banded.alias("y"),
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")))
        .select(F.col(f"x.{id_col}").alias("doc_a"),
                F.col(f"y.{id_col}").alias("doc_b"))
        .distinct())
    # Exact-Jaccard verification of the CANDIDATES ONLY: join each pair back
    # to its two shingle sets and intersect in-row. The verify cost is
    # O(candidate pairs), not O(all near-dup pairs) — running the full
    # inverted-index self-join here (as `jaccard_pairs` does) would redo the
    # very computation LSH exists to avoid at 100 TB.
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("sh_set").alias("sh_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("sh_set").alias("sh_b"))
    verified = (cand.join(sa, "doc_a").join(sb, "doc_b")
                .select("doc_a", "doc_b",
                        F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
                        .alias("shared"),
                        F.size("sh_a").cast("long").alias("n_a"),
                        F.size("sh_b").cast("long").alias("n_b")))
    return track((verified
                  .where(F.lit(100) * F.col("shared")
                         >= F.lit(threshold_pct)
                         * (F.col("n_a") + F.col("n_b") - F.col("shared")))
                  .select("doc_a", "doc_b", "shared", "n_a", "n_b")), sets)


def repeated_blocks(df: DataFrame, block: int = 16, min_count: int = 2,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cross-document repeated token-block detection — the chunk-level
    exact-dedup pass of a training-data pipeline (boilerplate/template
    mining): non-overlapping blocks of ``block`` tokens, md5-keyed,
    reporting blocks present in >= ``min_count`` distinct documents.

    Shuffle carries (16-byte digest, id) only; block extraction is in-row
    (``transform(sequence(...))``, codegen). At corpus scale add a
    ``doc_freq_cap``-style guard upstream if a single template dominates a
    bucket (same skew pattern as the shingle join)."""
    ws = F.split(F.col(text_col), " ")
    nb = (F.size(ws) / block).cast("int")  # full blocks only
    blocks = F.transform(
        F.sequence(F.lit(0), nb - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i * block + 1, block))
                        .cast("binary")),
    )
    ex = (df.where(F.size(ws) >= block)
          .select(F.col(id_col),
                  F.explode(F.array_distinct(blocks)).alias("block_md5")))
    return (ex.groupBy("block_md5")
            .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("first_doc"))
            .where(F.col("n_docs") >= min_count))


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              hash_family: str = "xxhash64") -> DataFrame:
    """64-bit SimHash over whitespace tokens, JVM-side: per token compute
    xxhash64, then for each bit position sum +/-1 across tokens and take the
    sign. Hamming-close simhashes ~ similar token multisets.

    Computed entirely in-row (``aggregate`` over the token hashes with a
    64-counter array accumulator, same shape as ``_minhash_sig``): ZERO
    shuffles — the naive explode-to-(doc, token) + ``groupBy(doc)`` form
    pushes one row per corpus token through an exchange, which at 100 TB is
    the full tokenized corpus through a single shuffle. Row-identical to
    that form (pinned by a differential test in tests/test_textops.py).

    ``hash_family="portable"``: the 64 token-hash bits come from md5
    instead — bits 0..59 from the low 60 bits of md5(token), bits 60..63
    from the (independent) second md5 half — so the identical fingerprint
    is computable in DuckDB (oracle q15). Production default xxhash64.

    NULL-text rows are DROPPED (no tokens -> no fingerprint; a NULL
    sketch cannot participate in dedup and would only ride shuffles)."""
    df = df.where(F.col(text_col).isNotNull())
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    # constant array of the 64 bit masks; shiftleft keeps the arithmetic on
    # the JVM (1<<63 overflows a Python-literal long in F.lit; as a JVM
    # shift it wraps to the sign bit, which is fine for a fingerprint).
    masks = F.array(*[F.shiftleft(one, b) for b in range(64)])
    if hash_family == "portable":
        # per-bit (half, mask) constants: bits 0..59 test the low md5
        # half, 60..63 the high half — all masks < 2^60, plain literals.
        half_masks = F.array(*[
            F.struct(F.lit(0 if b < 60 else 1).alias("half"),
                     F.lit(1 << (b if b < 60 else b - 60)).cast("long")
                     .alias("mask"))
            for b in range(64)])
        tok_h = F.transform(
            F.split(F.col(text_col), " "),
            lambda t: F.struct(portable_hash64(t).alias("lo"),
                               portable_hash64_hi(t).alias("hi")))
        bit_sums = F.aggregate(
            tok_h,
            F.array_repeat(zero, 64),
            lambda acc, h: F.zip_with(
                acc, half_masks,
                lambda a, m: a + F.when(
                    F.when(m["half"] == 0, h["lo"]).otherwise(h["hi"])
                    .bitwiseAND(m["mask"]) != 0, one).otherwise(-one)),
        )
    elif hash_family == "xxhash64":
        bit_sums = F.aggregate(
            F.transform(F.split(F.col(text_col), " "),
                        lambda t: F.xxhash64(t)),
            F.array_repeat(zero, 64),
            lambda acc, h: F.zip_with(
                acc, masks,
                lambda a, m: a + F.when(h.bitwiseAND(m) != 0,
                                        one).otherwise(-one)),
        )
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    sim = F.aggregate(
        F.zip_with(bit_sums, masks,
                   lambda s, m: F.when(s > 0, m).otherwise(zero)),
        zero, lambda a, b: a + b)
    return df.select(id_col, sim.alias("simhash"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: lexicographic-min token digest
    (md5 hex) over each block of ``window`` tokens -> sorted set of selected
    digests (content-defined sampling). Used for fast containment checks.

    md5-hex rather than xxhash64 so the identical fingerprint is computable
    on any SQL engine (oracle-exact: q23); the selection statistics are the
    same — min over a block of uniformly-hashed tokens."""
    ws = F.split(F.col(text_col), " ")
    n_blocks = ((F.size(ws) - 1) / window).cast("int")  # floor for positives
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks),
        lambda i: F.array_min(F.transform(F.slice(ws, i * window + 1, window),
                                          lambda t: F.md5(t.cast("binary")))),
    )
    return df.select(F.col(id_col),
                     F.array_sort(F.array_distinct(blocks)).alias("fingerprint"))

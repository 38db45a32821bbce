"""Entity canonicalization: broadcast alias dictionary + MinHash-LSH
blocking + within-block verify (SURVEY.md §7.1 step 5).

The reference has no cross-document linking (all JEREX ops are
intra-document); canonicalization is the rebuild's addition that turns
per-document entity clusters into corpus-level canonical ids:

1. normalize the entity surface form (lowercase, squeeze whitespace);
2. exact-match against the alias dictionary — a *broadcast* hash join
   (the dict is small by construction: ~10^6 rows max at web scale);
3. for misses, MinHash-LSH blocking over character 3-gram shingles of
   the surface (md5-based minhash signatures — same portable scheme as
   operators/dedup.py) joins candidates to aliases sharing a band, and
   the within-block verify keeps the best alias by edit-distance ratio
   <= ``max_ed_ratio`` (built-in ``levenshtein`` — JVM-side);
4. anything still unmatched becomes self-canonical:
   ``canonical_id = 'self:' || md5(norm_phrase)``.

Scale path: step 2 is a broadcast join (no shuffle of the big side);
step 3 shuffles only the *unmatched minority* on (hash_id, sig), which
AQE skew-splits if one band is hot.  No driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 6
SHINGLE_C = 3          # character shingles
MAX_ED_RATIO = 0.34    # verify: levenshtein / greatest(len) must be <=


def normalize_phrase(col):
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def _char_shingles(col, k: int = SHINGLE_C):
    """All k-char shingles of a string as an array column (JVM-side)."""
    n = F.greatest(F.length(col) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n),
                       lambda i: F.substring(col, i, k))


def _minhash_sigs(df: DataFrame, text_col: str, id_cols: list[str]):
    """(id_cols..., hash_id, sig) minhash signatures over char shingles."""
    sh = df.select(*id_cols,
                   F.explode(_char_shingles(F.col(text_col)))
                   .alias("shingle")).distinct()
    return (sh.select(*id_cols, "shingle",
                      F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1)))
                      .alias("hash_id"))
            .select(*id_cols, "hash_id",
                    F.md5(F.concat_ws("|", F.col("hash_id").cast("string"),
                                      F.col("shingle"))).alias("h"))
            .groupBy(*id_cols, "hash_id").agg(F.min("h").alias("sig")))


def canonicalize_entities(entities: DataFrame, alias_dict: DataFrame,
                          phrase_col: str = "phrase") -> DataFrame:
    """entities(doc_key, entity_idx, <phrase_col>, ...) x
    alias_dict(alias, canonical_id) -> + (canonical_id, match_kind).

    alias_dict is broadcast; entities keep all their columns.
    """
    # ents feeds both the exact-hit branch and the miss branch; without
    # a cache Spark recomputes the upstream plan for each
    ents = entities.withColumn(
        "norm", normalize_phrase(F.col(phrase_col))).persist()
    dict_n = (alias_dict
              .withColumn("alias_norm", normalize_phrase(F.col("alias")))
              .select("alias_norm", "canonical_id").distinct())

    # 1) exact broadcast join
    exact = ents.join(F.broadcast(dict_n),
                      ents.norm == dict_n.alias_norm, "left")
    hits = (exact.filter(F.col("canonical_id").isNotNull())
            .drop("alias_norm")
            .withColumn("match_kind", F.lit("exact")))
    misses = (exact.filter(F.col("canonical_id").isNull())
              .drop("alias_norm", "canonical_id"))

    # 2) LSH blocking for the misses
    miss_keys = misses.select("doc_key", "entity_idx", "norm").distinct()
    ent_sig = _minhash_sigs(miss_keys, "norm",
                            ["doc_key", "entity_idx", "norm"])
    dict_sig = _minhash_sigs(dict_n.withColumnRenamed("alias_norm", "a"),
                             "a", ["a", "canonical_id"])
    cand = (ent_sig.join(dict_sig, ["hash_id", "sig"])
            .select("doc_key", "entity_idx", "norm", "a", "canonical_id")
            .distinct())
    verified = (cand
                .withColumn("ed", F.levenshtein("norm", "a"))
                .withColumn("ratio", F.col("ed") / F.greatest(
                    F.length("norm"), F.length("a")))
                .filter(F.col("ratio") <= MAX_ED_RATIO))
    # best alias per entity: lowest (ratio, canonical_id) — deterministic
    from pyspark.sql.window import Window
    w = Window.partitionBy("doc_key", "entity_idx").orderBy(
        F.col("ratio"), F.col("canonical_id"))
    best = (verified.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_key", "entity_idx",
                    F.col("canonical_id").alias("lsh_canonical_id")))

    fuzzy = (misses.join(best, ["doc_key", "entity_idx"], "left")
             .withColumn(
                 "canonical_id",
                 F.coalesce(F.col("lsh_canonical_id"),
                            F.concat(F.lit("self:"), F.md5("norm"))))
             .withColumn(
                 "match_kind",
                 F.when(F.col("lsh_canonical_id").isNotNull(), "lsh")
                 .otherwise(F.lit("self")))
             .drop("lsh_canonical_id"))
    return hits.unionByName(fuzzy).drop("norm")

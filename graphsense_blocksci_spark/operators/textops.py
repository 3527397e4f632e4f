"""Shared text primitives for the LLM-data-pipeline operators.

Everything here is a native column expression (whole-stage codegen, no
UDF, no shuffle): normalization, tokenization, word-shingling, and a
deterministic 28-bit shingle hash built from md5 — chosen because md5 is
bit-identical across engines, so the DuckDB correctness oracle can
reproduce every derived value exactly (`('0x'||substr(md5(s),1,7))::BIGINT`
≡ `conv(substring(md5(s),1,7),16,10)`).

The 28-bit hash domain is deliberate: minhash permutations
`(a*x + b) % p` with `p = 2^31-1` and `a,b < 2^31` stay below 2^60 —
no 64-bit overflow in either engine (DuckDB raises on BIGINT overflow;
Spark wraps silently — both are wrong answers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: modulus of the minhash permutation family.
MINHASH_PRIME = 2_147_483_647
# Number of minhash permutations and LSH banding (4 bands x 2 rows).
MINHASH_PERMS = 8
LSH_BAND_ROWS = 2
# Deterministic permutation coefficients, same literals in the SQL oracle.
MINHASH_COEFFS: list[tuple[int, int]] = [
    ((1_103_515_245 * (i + 1)) % MINHASH_PRIME, (12_345 + 2_654_435_761 * i) % MINHASH_PRIME)
    for i in range(MINHASH_PERMS)
]
SHINGLE_K = 3  # word trigrams


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def spread(df: DataFrame) -> DataFrame:
    """Repartition a narrow scan up to the session's parallelism.

    CPU-heavy per-row work (regex, md5, shingling, decode) is
    throughput-bound by partition count: a single-file local corpus
    scans as ONE partition and serializes on one core. A production
    corpus has thousands of splits and this is a no-op — the guard
    checks the actual scan width, so no shuffle is added at scale.
    """
    if df.isStreaming:
        # micro-batch partitioning is the source's job (maxFilesPerTrigger
        # etc.), and .rdd is illegal on a streaming frame
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def normalize_text(col: Column | str) -> Column:
    """lower + trim + collapse internal whitespace to single spaces."""
    return F.lower(F.trim(F.regexp_replace(_c(col), r"\s+", " ")))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text; empty text -> []."""
    return F.filter(F.split(normalize_text(col), " "), lambda t: t != "")


def word_shingles(col: Column | str, k: int = SHINGLE_K) -> Column:
    """Distinct word k-grams joined by single spaces.

    1-based element_at indexing mirrors the oracle's DuckDB list
    indexing so both engines enumerate identical shingles.
    """
    toks = tokens(col)
    n = F.size(toks)
    # Guard n < k: Spark's sequence(1, 0) is DESCENDING ([1, 0]), not
    # empty, and element_at(_, 0) raises — short docs get [] explicitly.
    idx = F.sequence(F.lit(1), n - (k - 1))
    gram = F.when(
        n >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(gram)


def hash28(col: Column) -> Column:
    """28-bit deterministic hash of a string: first 7 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def hash60(col: Column) -> Column:
    """60-bit deterministic hash of a string: first 15 hex chars of
    md5, which fits a signed 64-bit long. Use for NODE IDENTITY at
    scale (birthday bound ~2^30 keys before expected collisions, vs
    ~2^14 for hash28 — a 28-bit id falsely merges distinct entities
    once the address universe nears 2^28)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingle_hashes(col: Column | str, k: int = SHINGLE_K) -> Column:
    """Distinct 28-bit hashes of the word k-grams.

    PERFORMANCE: as a single column expression the token array is
    closed over inside the shingling lambda, and Spark's interpreted
    higher-order-function evaluation re-evaluates closed-over
    expression trees PER ELEMENT — O(tokens²) per row. Fine for tests
    and one-off use; every operator on a documents table should go
    through ``shingle_hash_frame`` (staged, linear) instead.
    """
    return F.array_distinct(F.transform(word_shingles(col, k), hash28))


def shingle_hash_frame(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    use_arrow: bool = True,
) -> DataFrame:
    """(id, _sh) frame: distinct 28-bit md5 shingle hashes per doc.

    Two implementations with identical semantics (property-tested
    equal):

    - Arrow path (default): `mapInPandas` — normalize/tokenize/
      shingle/md5 in batched Python. Shingling is per-element string
      work that Spark's higher-order functions execute INTERPRETED
      (no whole-stage codegen), measured 24× slower than the Python
      loop at sf0.1 — this is exactly the "vectorized UDF beats
      interpreted expression" case the slow-path rule carves out.
    - Native path: pure column expressions, STAGED so each array
      materializes across a projection boundary (lambda bodies that
      close over expression trees re-evaluate them per element;
      multi-referenced non-cheap aliases survive CollapseProject).
      Kept as the zero-Python reference implementation.
    """
    if use_arrow:
        return _shingle_hash_frame_arrow(docs, text_col, id_col, k)
    toks = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col),
        tokens(text_col).alias("_toks"),
    )
    n = F.size("_toks")
    idx = F.sequence(F.lit(1), n - (k - 1))
    gram = F.when(
        n >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(F.col("_toks"), (i + j).cast("int")) for j in range(k)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select(id_col, F.array_distinct(gram).alias("_grams"))
    return grams.select(
        id_col, F.array_distinct(F.transform("_grams", hash28)).alias("_sh")
    )


def _shingle_hash_frame_arrow(
    docs: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Arrow-batched shingle hashing. Semantics mirror the native
    path exactly: collapse ASCII whitespace runs → trim → lower →
    split on space → distinct word k-grams → first 7 hex chars of md5
    as int (hashlib md5 ≡ Spark md5 ≡ DuckDB md5 on utf-8 bytes).
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("_sh", T.ArrayType(T.LongType())),
        ]
    )
    src = spread(docs).select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col).alias("_text")
    )

    def batches(it):
        import hashlib
        import re

        import pandas as pd

        # ASCII \s to match Java/RE2 semantics (not unicode \s)
        ws = re.compile(r"\s+", re.ASCII)
        for pdf in it:
            shs = []
            for text in pdf["_text"]:
                if text is None:
                    shs.append([])
                    continue
                toks = [
                    t
                    for t in ws.sub(" ", text).strip().lower().split(" ")
                    if t
                ]
                if len(toks) >= k:
                    grams = {
                        " ".join(toks[i : i + k])
                        for i in range(len(toks) - k + 1)
                    }
                    hs = {
                        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:7], 16)
                        for g in grams
                    }
                else:
                    hs = set()
                shs.append(sorted(hs))
            yield pd.DataFrame({id_col: pdf[id_col], "_sh": shs})

    return src.mapInPandas(batches, schema=out_schema)



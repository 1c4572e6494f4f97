"""SimHash + Hamming-ball candidate lookup (engine 2 of 3).

Per BASELINE.json north_star: 60-bit SimHash over distinct normalized
tokens, candidate pairs found with the pigeonhole principle — split the
signature into ``hamming_max + 1`` chunks and equi-join on any equal
chunk. Pigeonhole blocking is *exact*: two signatures within Hamming
distance d must agree on at least one of d+1 chunks, so candidate recall
is 1.0 by construction (unlike MinHash-LSH's probabilistic bands). The
chunk join is the same blocking-key pattern as the reference's per-rule
term lookups (/root/reference/src/deduplicateQueryBuilder.js:75-107).

Token hash: low 60 bits of md5 (first 15 hex chars) — chosen because it is
reproducible in any engine (the DuckDB oracle computes the identical
signature in SQL; tests/test_entry.py proves bit-equality). Signature bit
b is set iff the (+1/−1) vote sum over distinct tokens is strictly
positive — ties → 0, matching the SQL mirror.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from ..functions.normalize import tokens_py


def token_hash_py(token: str, bits: int = 60) -> int:
    """Low ``bits`` of md5 — mirrored by the oracle as
    ``('0x' || substr(md5(t), 1, bits//4))::BIGINT``.

    r6: computed from the raw digest bytes — ``int(hexdigest[:h], 16)``
    equals the big-endian int of the first ``ceil(h/2)`` digest bytes
    shifted right by 4 bits when ``h`` is odd (15 hex chars = 60 bits =
    first 8 bytes >> 4). Identical value, no hex-string build/parse
    (~25% off the md5 loop that dominates this kernel, PLANS.md §8).
    """
    nhex = bits // 4
    v = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[: (nhex + 1) // 2], "big")
    return v >> 4 if nhex % 2 else v


# Worker-global shingle-hash memo (the minhash.py::_TOKEN_CACHE pattern):
# the md5-per-shingle loop dominates the simhash kernel (PLANS.md §8), and
# near-duplicate / boilerplate corpora repeat most shingles across docs —
# memoization is pure (deterministic), bounded, and persists across Arrow
# batches in a reused python worker. Measured: simhash_hamming_pairs
# 3.98 → 3.54 s at sf0.1 from this change alone (1.28 s once the
# hamming_pairs self-join stopped double-running the kernel; 1.10 s in
# the end-of-round battery, BENCH/battery_r6_run2.json).
_SHINGLE60_CACHE: dict[str, int] = {}
_SHINGLE60_CACHE_MAX = 1 << 20


def _token_hash60(token: str) -> int:
    v = _SHINGLE60_CACHE.get(token)
    if v is None:
        if len(_SHINGLE60_CACHE) >= _SHINGLE60_CACHE_MAX:
            _SHINGLE60_CACHE.clear()
        v = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big") >> 4
        _SHINGLE60_CACHE[token] = v
    return v


def simhash_py(text: str | None, bits: int = 60, k: int = 3) -> int | None:
    """SimHash over distinct k-token shingles (NOT unigrams): with a small
    shared vocabulary, every document's unigram set converges and unigram
    simhashes collapse within a few bits of each other, merging unrelated
    docs — measured on the synthetic corpus: half the corpus fused into one
    cluster. Shingles keep the feature sets document-specific (same reason
    the MinHash engine shingles)."""
    from .minhash import shingles_py

    toks = shingles_py(text, k)
    if not toks:
        return None
    if bits == 60:  # the engine path: memoized digest-based hashes
        h = np.fromiter((_token_hash60(t) for t in toks), dtype=np.uint64,
                        count=len(toks))
    else:
        h = np.array([token_hash_py(t, bits) for t in toks], dtype=np.uint64)
    bit_matrix = (h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = 2 * bit_matrix.sum(axis=0).astype(np.int64) - len(toks)
    # pack sign bits without a Python bit loop (sum of distinct powers < 2^60)
    return int((np.uint64(1) << np.arange(bits, dtype=np.uint64))[votes > 0].sum())


def simhash_udf(cfg: DedupConfig):
    """Arrow-batched simhash kernel, per-document numpy vote reduction.

    Measured decision (PLANS.md §SimHash kernel): a whole-batch variant —
    flat shingle array + S×60 bit matrix + ``np.add.reduceat`` segment
    sums — was built and A/B'd at 40k pages / 16 threads: per-doc numpy is
    STABLE at 2-4 s while the batch-matrix kernel oscillated 3-22 s
    (multi-10-MB allocation churn in reused python workers). The md5 loop
    dominates either way; the per-doc bit matrix (~150×60) stays in cache.
    Bit-exactness vs the DuckDB mirror is asserted by the simhash_values
    oracle either way.
    """
    bits = cfg.simhash_bits
    k = cfg.shingle_k

    @F.pandas_udf(T.LongType())
    def sh(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            yield pd.Series([simhash_py(t, bits, k) for t in batch], dtype=object)

    return sh


def with_simhash(docs: DataFrame, cfg: DedupConfig, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc"), simhash_udf(cfg)(F.col(text_col)).alias("simhash")
    )


def _blocking_keys(cfg: DedupConfig) -> list:
    """Compile-time list of blocking-key Column expressions.

    ``pigeonhole``: d+1 chunks of bits/(d+1) bits — any one chunk clean.
    Minimal explode factor (4 rows/doc at d=3) but narrow 15-bit keys:
    random-pair collision ≈ 4·2⁻¹⁵ per doc pair, so candidate volume grows
    quadratically at extreme corpus sizes.

    ``multiblock``: m=simhash_blocks blocks; a pair within distance d has
    ≥ m−d clean blocks, so joining on every C(m, m−d) combination of m−d
    blocks is still EXACT (recall 1.0) with much wider keys — m=6, d=3
    gives 20 combinations of 30-bit keys (collision ≈ 20·2⁻³⁰): ~5 orders
    of magnitude fewer random candidates for a 5× explode factor. This is
    the 100 TB setting (measured curves in PLANS.md §SimHash).
    """
    mask_of = lambda nbits: (1 << nbits) - 1  # noqa: E731
    if cfg.simhash_blocking == "pigeonhole":
        n_chunks = cfg.hamming_max + 1
        chunk_bits = cfg.simhash_bits // n_chunks
        return [
            F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(F.lit(mask_of(chunk_bits)))
            for c in range(n_chunks)
        ]
    if cfg.simhash_blocking == "multiblock":
        from itertools import combinations

        m, d = cfg.simhash_blocks, cfg.hamming_max
        if m <= d:
            raise ValueError(f"simhash_blocks={m} must exceed hamming_max={d}")
        block_bits = cfg.simhash_bits // m
        mask = mask_of(block_bits)
        keys = []
        for combo in combinations(range(m), m - d):
            kv = F.lit(0).cast("long")
            for j, c in enumerate(combo):
                block = F.shiftright(F.col("simhash"), c * block_bits).bitwiseAND(F.lit(mask))
                kv = kv.bitwiseOR(F.shiftleft(block, j * block_bits))
            keys.append(kv)
        return keys
    raise ValueError(f"unknown simhash_blocking: {cfg.simhash_blocking}")


def hamming_pairs(sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """All pairs (src < dst) with Hamming(simhash) <= hamming_max.

    Exact blocking join (strategy per ``cfg.simhash_blocking`` — see
    :func:`_blocking_keys`), then JVM-side popcount verification:
    ``bit_count(s1 ^ s2)`` — whole-stage codegen, no Python. The result
    set is identical under either blocking; only candidate volume differs.
    """
    # r6 (guide §4, the lsh.candidate_pairs guard): the self-join below
    # expands the signature plan once per side — if it still contains the
    # Arrow simhash kernel (ad-hoc composition, no stage table in
    # between), every doc would pay the md5-shingle loop TWICE.
    # Materialize the (doc, simhash) table once in that case only; when
    # sigs is already a stored/checkpointed table the extra copy is pure
    # cost. Measured: simhash_hamming_pairs 3.85 → 2.6 s at sf0.1, and
    # the multi-engine pipeline's simhash engine the same way.
    if "EvalPython" in sigs._jdf.queryExecution().executedPlan().toString():
        sigs = sigs.localCheckpoint()
    keyed = (
        sigs.filter(F.col("simhash").isNotNull())
        .select("doc", "simhash",
                F.posexplode(F.array(*_blocking_keys(cfg))).alias("chunk_id", "chunk_val"))
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("src"),
            F.col("b.doc").alias("dst"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= cfg.hamming_max)
        .distinct()
    )


def duckdb_simhash_sql(docs_rel: str, id_sql: str, shingles_sql: str, bits: int = 60) -> str:
    """DuckDB SQL computing the identical shingle-simhash per doc
    (``shingles_sql`` must produce the distinct k-shingle list mirroring
    minhash.shingles_py)."""
    return f"""
    WITH toks AS (
      SELECT {id_sql} AS doc, unnest({shingles_sql}) AS t
      FROM {docs_rel}
    ),
    hashed AS (
      SELECT doc, ('0x' || substr(md5(t), 1, {bits // 4}))::BIGINT AS h FROM toks
    ),
    votes AS (
      SELECT doc, b.b AS b,
             sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed, (SELECT unnest(range({bits})) AS b) b
      GROUP BY doc, b.b
    )
    SELECT doc, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
    FROM votes GROUP BY doc
    """

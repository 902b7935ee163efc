"""Deduplication operators for large-scale training-data pipelines.

The reference engine has no dedup subsystem (it is a spatial engine); these
are the web-scale companions the north rule's Common-Crawl-style table needs.
All of them follow the engine's design stance: pure Column math (JVM,
whole-stage codegen) wherever possible, deterministic hashing via md5 (bit-
identical between Spark and DuckDB so the driver's oracle gate can verify
values, not just row counts).

Operators
---------
* ``exact_dedup``        — hash-groupBy exact duplicate clustering
* ``shingles``           — word w-shingle sets (the MinHash/Jaccard input)
* ``minhash_signatures`` — k-permutation MinHash sketch per document
* ``lsh_candidate_pairs``— banded-LSH bucket self-join → candidate pairs
* ``minhash_dedup_pairs``— LSH candidates filtered by estimated Jaccard
* ``jaccard_pairs``      — EXACT n-gram Jaccard verify on candidate pairs
* ``simhash``            — 32-bit SimHash per document + hamming pairs

Scale notes (the 100 TB story):
* exact_dedup is one shuffle on a 16-byte key with map-side partial agg.
* MinHash: signatures are map-only; the LSH band explode multiplies rows by
  ``bands`` (small constant); the bucket self-join shuffles on the band-hash
  key — hot buckets (boilerplate docs) are exactly the skew AQE's skew-join
  splitting handles, and the pair output is deduped before the (expensive)
  exact-Jaccard verify, which joins shingle arrays back only for candidates.
* Everything avoids per-row Python entirely.

Hash contract: h(s) = int(md5(s)[:8 hex], 16) ∈ [0, 2^32); permutation j is
h_j(x) = ((x % P) * A_j + B_j) % P with P = 2^31-1 (Mersenne), A_j/B_j
deterministic odd constants — ((x%P)*A) ≤ 2^62 so the fold never overflows
int64 in either engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gdal_spark.functions import stable_round

MERSENNE = 2147483647  # 2^31 - 1


def _perm_ab(j: int) -> tuple[int, int]:
    """Deterministic permutation constants (odd multiplier, offset)."""
    a = (2 * j + 1) * 40503 % MERSENNE
    b = (j * 2654435761 + 12345) % MERSENNE
    return a, b


def md5_h32(col: Column) -> Column:
    """First 8 hex digits of md5 → bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def sql_md5_h32(expr: str) -> str:
    return f"('0x' || substring(md5({expr}), 1, 8))::bigint"


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate clusters: one row per distinct text, keeping the
    lowest id as the canonical representative.

    Output: (text_hash, keep_id, dup_count). One shuffle on the md5 key
    with map-side partial aggregation; at 100 TB the key is 32 bytes/row
    and never the full text.
    """
    return (
        df.select(F.md5(F.col(text)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def sql_exact_dedup(table: str = "documents", text: str = "text",
                    id_col: str = "doc_id") -> str:
    return (
        f"SELECT md5({text}) AS text_hash, min({id_col}) AS keep_id, "
        f"count(*) AS dup_count FROM {table} GROUP BY md5({text})"
    )


# ---------------------------------------------------------------------------
# Shingles
# ---------------------------------------------------------------------------

def shingles(text: Column, w: int = 3) -> Column:
    """Distinct word w-shingles of ``text`` (space-joined token windows).

    Docs shorter than w tokens yield their full token string as the single
    shingle (so no document has an empty set and Jaccard is total).
    """
    toks = F.split(F.trim(text), " +")
    n = F.size(toks)
    win = F.sequence(F.lit(1), F.greatest(n - F.lit(w - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(win, lambda i: F.array_join(F.slice(toks, i, w), " "))
    )


def sql_shingles(text_expr: str = "text", w: int = 3) -> str:
    toks = f"string_split_regex(trim({text_expr}), ' +')"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {w - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {w - 1}), ' ')))"
    )


def shingle_hashes(text: Column, w: int = 3) -> Column:
    """Shingle set → array of 32-bit md5 hashes (the MinHash universe).

    NOTE: as a single Column expression the token split is re-evaluated per
    window index in the interpreted higher-order-function path (~3.5×
    slower). The hot-path consumers (minhash_signatures, jaccard_pairs) use
    the two-projection form instead: split once into a materialized `_toks`
    attribute, then shingle from it (`shingles_from_tokens`)."""
    return F.transform(shingles(text, w), md5_h32)


def shingles_from_tokens(toks_col: str, w: int = 3) -> Column:
    """Shingle array from an already-projected token-array column — the
    attribute reference makes the split evaluate once per row."""
    n = F.size(toks_col)
    win = F.sequence(F.lit(1), F.greatest(n - F.lit(w - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(win, lambda i: F.array_join(F.slice(toks_col, i, w), " "))
    )


def sql_shingle_hashes(text_expr: str = "text", w: int = 3) -> str:
    return (
        f"list_transform({sql_shingles(text_expr, w)}, "
        f"s -> ('0x' || substring(md5(s), 1, 8))::bigint)"
    )


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
    num_perm: int = 16, w: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>[num_perm]) MinHash sketch. Map-only.

    Split of labor (the 100 TB hot path): shingling + md5 hashing runs as a
    pure JVM column (`shingle_hashes` — whole-stage codegen, exactly the
    `sql_shingle_hashes` semantics), so NO string ever crosses into Python;
    the pandas UDF receives the int64 hash arrays and performs only the
    (total_shingles × num_perm) affine-permutation min-reduce, vectorized
    across the whole Arrow batch with np.minimum.reduceat (no per-doc
    Python loop either). Values are bit-identical to sql_minhash_sig.
    """
    # Honest parallelism for the compute-heavy sketch stage: a small-file
    # input (e.g. one parquet row group locally) would otherwise run the
    # whole shingle+hash+reduce as ONE task. At scale inputs already carry
    # >= defaultParallelism partitions, so this is a no-op — no shuffle is
    # ever added to a well-partitioned 100 TB table.
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)

    A = np.array([_perm_ab(j)[0] for j in range(num_perm)], dtype=np.int64)
    B = np.array([_perm_ab(j)[1] for j in range(num_perm)], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def sig_udf(hss: pd.Series) -> pd.Series:
        out = []
        n = len(hss)
        start = 0
        # chunk by docs so the (S, P) permutation matrix stays ~tens of MB
        while start < n:
            end, s_total = start, 0
            while end < n and s_total < 2_000_000 // max(num_perm, 1):
                s_total += len(hss.iloc[end])
                end += 1
            lens = np.array(
                [len(hss.iloc[i]) for i in range(start, end)], dtype=np.int64
            )
            flat = np.concatenate(
                [np.asarray(hss.iloc[i], dtype=np.int64)
                 for i in range(start, end)]
            )
            m = ((flat[:, None] % MERSENNE) * A[None, :] + B[None, :]) % MERSENNE
            offs = np.zeros(lens.shape[0], dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            sig = np.minimum.reduceat(m, offs, axis=0)
            out.extend(list(sig))
            start = end
        return pd.Series(out)

    # three projection steps so split/shingle/hash each evaluate ONCE per
    # row (a single nested expression re-evaluates the split per window
    # index in the interpreted HOF path — ~3.5× slower at sf0.1)
    step = df.select(
        F.col(id_col), F.split(F.trim(F.col(text)), " +").alias("_toks")
    )
    step = step.select(
        F.col(id_col), shingles_from_tokens("_toks", w).alias("_sh")
    )
    step = step.select(
        F.col(id_col), F.transform("_sh", md5_h32).alias("_hs")
    )
    return step.select(F.col(id_col), sig_udf(F.col("_hs")).alias("sig"))


def sql_minhash_sig(text_expr: str = "text", num_perm: int = 16, w: int = 3) -> str:
    """DuckDB list literal mirroring minhash_signatures' sig column."""
    hashes = sql_shingle_hashes(text_expr, w)
    parts = []
    for j in range(num_perm):
        a, b = _perm_ab(j)
        parts.append(
            f"list_min(list_transform({hashes}, "
            f"x -> ((x % {MERSENNE}) * {a} + {b}) % {MERSENNE}))"
        )
    return "[" + ", ".join(parts) + "]"


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH: same md5(band slice) in any band → candidate pair.

    Plan: explode to ``bands`` rows/doc → shuffle on (band, band_hash) →
    within-bucket self-join → distinct (id_a < id_b) pairs. Hot buckets are
    split by AQE skew handling; the distinct dedups multi-band collisions.
    """
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bnd).alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            F.lit(str(bnd)),
                            *[
                                F.element_at("sig", bnd * rows_per_band + r + 1)
                                .cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    ).alias("bh"),
                )
                for bnd in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "bh"], how="inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
    num_perm: int = 16, w: int = 3, bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs: LSH candidates with estimated Jaccard ≥ threshold.

    est_jaccard = fraction of matching signature positions (rounded 6dp).
    """
    rows_per_band = num_perm // bands
    # persist: the signature table is consumed three times (banding + both
    # sides of the est-Jaccard join) — without this the whole shingle+minhash
    # lineage recomputes each time
    sigs = minhash_signatures(df, text, id_col, num_perm, w).persist()
    pairs = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(float(num_perm))
    )
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .withColumn("est_jaccard", stable_round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (the verify stage after LSH)
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text: str = "text",
    id_col: str = "doc_id", w: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given (id_a, id_b) pairs."""
    sh = df.select(
        F.col(id_col), F.split(F.trim(F.col(text)), " +").alias("_toks")
    ).select(F.col(id_col), shingles_from_tokens("_toks", w).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", stable_round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash (32-bit) + hamming-distance near-dup pairs
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(text: Column, w: int = 1) -> Column:
    """32-bit SimHash over word tokens (w=1) or shingles (w>1).

    bit b of the fingerprint = 1 iff sum over features of +-1 (per feature's
    hash bit b) is positive. Feature md5 hashing runs JVM-side (whole-stage
    codegen, same exprs as sql_simhash); the pandas UDF receives int64 hash
    arrays and computes ALL 32 bit votes batch-vectorized with
    np.add.reduceat — zero Python string hashing, zero per-doc loop.
    Integer arithmetic throughout => bit-identical to sql_simhash.
    """
    weights = (1 << np.arange(SIMHASH_BITS, dtype=np.int64))

    @F.pandas_udf("long")
    def sh_udf(hss: pd.Series) -> pd.Series:
        out = np.empty(len(hss), dtype=np.int64)
        n = len(hss)
        start = 0
        while start < n:  # chunk: (S, 32) vote matrix stays ~tens of MB
            end, s_total = start, 0
            while end < n and s_total < 2_000_000 // SIMHASH_BITS * 8:
                s_total += len(hss.iloc[end])
                end += 1
            lens = np.array(
                [len(hss.iloc[i]) for i in range(start, end)], dtype=np.int64
            )
            flat = np.concatenate(
                [np.asarray(hss.iloc[i], dtype=np.int64)
                 for i in range(start, end)]
            )
            bits = ((flat[:, None] >> np.arange(SIMHASH_BITS)) & 1) * 2 - 1
            offs = np.zeros(lens.shape[0], dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            votes = np.add.reduceat(bits, offs, axis=0)  # (docs, 32)
            out[start:end] = (weights[None, :] * (votes > 0)).sum(axis=1)
            start = end
        return pd.Series(out)

    if w > 1:
        feats = shingle_hashes(text, w)
    else:
        feats = F.transform(F.split(F.trim(text), " +"), md5_h32)
    return sh_udf(feats)


def sql_simhash(text_expr: str = "text") -> str:
    hashes = (
        f"list_transform(string_split_regex(trim({text_expr}), ' +'), "
        f"t -> ('0x' || substring(md5(t), 1, 8))::bigint)"
    )
    terms = []
    for b in range(SIMHASH_BITS):
        vote = (
            f"list_reduce(list_prepend(0::bigint, {hashes}), "
            f"(acc, x) -> acc + ((x // {1 << b}) % 2) * 2 - 1)"
        )
        terms.append(f"(case when ({vote}) > 0 then {1 << b} else 0 end)")
    return "(" + " + ".join(terms) + ")::bigint"


def hamming32(a: Column, b: Column) -> Column:
    """Popcount of xor — hamming distance of two 32-bit simhashes."""
    x = a.bitwiseXOR(b)
    out = F.lit(0)
    for b_ in range(SIMHASH_BITS):
        out = out + F.shiftright(x, b_).bitwiseAND(F.lit(1))
    return out.cast("int")


def simhash_pairs(
    df: DataFrame, text: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance.

    Blocking: 4 bands of 8 bits — two docs within hamming ≤ 3 of each other
    share at least one exact 8-bit band (pigeonhole), so the self-join is on
    (band, band_byte) buckets, never all-pairs.
    """
    sh = df.select(F.col(id_col), simhash(F.col(text)).alias("sh"))
    banded = sh.select(
        id_col, "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("sh", i * 8).bitwiseAND(F.lit(255)).alias("byte"),
                )
                for i in range(4)
            ])
        ).alias("bk"),
    ).select(id_col, "sh", "bk.band", "bk.byte")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["band", "byte"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming32(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Near-dup cluster formation: distributed connected components over the
# candidate-pair graph (the step after LSH in every production dedup
# pipeline: pairs → clusters → keep one canonical doc per cluster).
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by min-label propagation WITH pointer jumping:
    each round (a) takes the min of own and neighbours' labels (one hop),
    then (b) path-halves by following its label's label (lbl ←
    labels[lbl].lbl — monotone: every node's label ≤ its id, so the jump
    only decreases). One-hop-only propagation needs O(diameter) rounds —
    a serpentine raster region made that the dominant cost; with the jump
    the round count is O(log diameter). Output: (doc_id, cluster_id,
    cluster_size) for every vertex in the pair graph, cluster_id = min
    doc_id of the component."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionAll(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("u").alias("id")).distinct().withColumn(
        "lbl", F.col("id")
    ).localCheckpoint(eager=True)
    # Per-round lifecycle: each round persists its labels and unpersists the
    # previous round's blocks once the next round is materialized (the
    # curve_rank materialize-then-unpersist pattern) — long sessions no
    # longer accumulate one block set per round. Lineage is truncated with a
    # localCheckpoint every _TRUNC_EVERY rounds, so at most
    # ceil(rounds/_TRUNC_EVERY) checkpoint block sets are left to the
    # ContextCleaner instead of one per round. _TRUNC_EVERY must stay small:
    # each half-step references its parent twice, so the un-truncated
    # logical plan grows geometrically per round; with the O(log d) round
    # count, truncating every 2 rounds keeps plans tiny.
    _TRUNC_EVERY = 2
    prev = None  # previous round's persisted labels (explicitly freed)
    converged = False
    for rnd in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("lbl").alias("_nl"))
        )
        hop = (
            labels.join(nbr_min, labels["id"] == nbr_min["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("_nl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .persist()
        )
        # pointer jump (path halving): lbl' = labels[lbl].lbl — every label
        # IS some node's id, and labels only decrease, so the jump is
        # monotone toward the component minimum
        jump_src = hop.select(
            F.col("id").alias("_jid"), F.col("lbl").alias("_jlbl")
        )
        new_labels = (
            hop.join(jump_src, hop["lbl"] == jump_src["_jid"], "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("_jlbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()  # materializes new_labels into its persist blocks
        )
        hop.unpersist()
        if prev is not None:
            prev.unpersist()
        prev = labels = new_labels
        if changed == 0:
            converged = True
            break
        if (rnd + 1) % _TRUNC_EVERY == 0:
            labels = new_labels.localCheckpoint(eager=True)
            new_labels.unpersist()
            prev = None
    if not converged:
        edges.unpersist()
        if prev is not None:
            prev.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds the budget); pass a larger max_iter"
        )
    edges.unpersist()
    if prev is not None:
        # final snapshot: downstream reads labels twice (sizes + join);
        # checkpoint once and free the last round's persist blocks
        labels = labels.localCheckpoint(eager=True)
        prev.unpersist()
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "lbl").select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        "cluster_size",
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — n-gram overlap between a training corpus and
# an evaluation/benchmark set (the train/test-leak scan every LLM data
# pipeline runs before training; same bucketed-join shape as LSH).
# ---------------------------------------------------------------------------

def decontaminate(
    corpus: DataFrame, benchmark: DataFrame,
    text: str = "text", id_col: str = "doc_id",
    w: int = 3, min_shared: int = 2,
) -> DataFrame:
    """Flag corpus documents sharing >= ``min_shared`` distinct w-gram
    shingles with ANY benchmark document.

    Plan (100 TB shape): both sides shingle+hash JVM-side (whole-stage
    codegen md5, the MinHash universe), explode to (shingle_hash, id) pairs,
    equi-join on the 8-byte hash — the benchmark side is small (an eval
    set) so Catalyst broadcasts it — then one partial-agg count per
    (corpus doc, benchmark doc). Output: (doc_id, bench_id, n_shared) for
    flagged pairs; distinct doc_ids are the contaminated set."""
    def _sh(df, out_id):
        step = df.select(
            F.col(id_col).alias(out_id),
            F.split(F.trim(F.col(text)), " +").alias("_toks"),
        )
        step = step.select(
            out_id, shingles_from_tokens("_toks", w).alias("_sh")
        )
        return step.select(
            out_id, F.explode(F.transform("_sh", md5_h32)).alias("_h")
        )

    c = _sh(corpus, "doc_id")
    b = _sh(benchmark, "bench_id")
    return (
        c.join(b, "_h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership prefilter (decontamination at 100 TB: the corpus
# side must not shuffle — a broadcast bitmap filters it map-only, and only
# bloom-POSITIVE docs (tiny) reach the exact verify join; no false
# negatives, so bloom-negative docs are provably clean)
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 65536  # 1024 longs — one array literal in the plan
BLOOM_K = 3
_BLOOM_A1, _BLOOM_A2, _BLOOM_B = 40503, 30103, 12347


def _bloom_positions(h: int, m_bits: int = BLOOM_M_BITS,
                     k: int = BLOOM_K) -> list[int]:
    """k probe positions for a 32-bit shingle hash — split-multiply mixing
    kept inside int64 range so the identical closed form runs as a JVM
    column expression."""
    hi, lo = h >> 16, h & 65535
    return [(hi * _BLOOM_A1 + lo * _BLOOM_A2 + i * _BLOOM_B) % m_bits
            for i in range(k)]


def bloom_bitmap(hashes, m_bits: int = BLOOM_M_BITS,
                 k: int = BLOOM_K) -> list[int]:
    """Build the bitmap (list of m/64 SIGNED int64 words, LSB-first) from
    an iterable of 32-bit hashes — driver-side, numpy-free, deterministic."""
    words = [0] * (m_bits // 64)
    for h in hashes:
        for pos in _bloom_positions(int(h), m_bits, k):
            words[pos // 64] |= 1 << (pos % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_hit_expr(shingles_col: str, bloom_col: str,
                   m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> str:
    """Spark SQL expression: TRUE iff ANY element of the shingle-hash
    array column has all k bloom bits set. Pure JVM higher-order
    function — whole-stage codegen, zero Python, zero shuffle."""
    probes = []
    for i in range(k):
        pos = (f"((shiftrightunsigned(h, 16) * {_BLOOM_A1} "
               f"+ (h & 65535) * {_BLOOM_A2} + {i * _BLOOM_B}) % {m_bits})")
        probes.append(
            f"((shiftrightunsigned(element_at({bloom_col}, "
            f"cast({pos} / 64 as int) + 1), "
            f"cast({pos} % 64 as int)) & 1) = 1)"
        )
    return f"exists({shingles_col}, h -> {' AND '.join(probes)})"

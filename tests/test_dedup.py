"""Dedup operators vs DuckDB oracles + structural properties."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import dedup as D

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')"
    )
    return con.execute(sql).fetchall()


def test_exact_dedup_vs_duckdb(spark, docs):
    got = {
        r["text_hash"]: (r["keep_id"], r["dup_count"])
        for r in D.exact_dedup(docs).collect()
    }
    want = {r[0]: (r[1], r[2]) for r in _duck(D.sql_exact_dedup())}
    assert got == want


def test_shingles_vs_duckdb(spark, docs):
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in docs.select(
            "doc_id", D.shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    want = {
        r[0]: sorted(r[1])
        for r in _duck(
            f"SELECT doc_id, {D.sql_shingles('text', 3)} AS sh FROM documents"
        )
    }
    assert got == want


def test_minhash_sig_vs_duckdb(spark, docs):
    got = {
        r["doc_id"]: list(r["sig"])
        for r in D.minhash_signatures(docs, num_perm=8).collect()
    }
    want = {
        r[0]: list(r[1])
        for r in _duck(
            f"SELECT doc_id, {D.sql_minhash_sig('text', 8)} AS sig FROM documents"
        )
    }
    assert got == want


def test_minhash_detects_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (0, base),
        (1, base),                       # exact dup
        (2, base.replace("lazy", "busy")),  # near dup
        (3, "completely different words about spark tiles and mercator math"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_dedup_pairs(
            df, num_perm=32, bands=8, threshold=0.5
        ).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) in pairs or (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_jaccard_exact(spark):
    rows = [(0, "a b c d e"), (1, "a b c x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    out = D.jaccard_pairs(df, pairs, w=2).collect()[0]
    # 2-shingles: {ab,bc,cd,de} vs {ab,bc,cx,xy}: |∩|=2 |∪|=6
    assert out["jaccard"] == pytest.approx(2 / 6, abs=1e-6)


def test_simhash_vs_duckdb(spark, docs):
    sample = docs.limit(50)
    got = {
        r["doc_id"]: r["sh"]
        for r in sample.select(
            "doc_id", D.simhash(F.col("text")).alias("sh")
        ).collect()
    }
    want = dict(
        _duck(
            f"SELECT doc_id, {D.sql_simhash('text')} AS sh FROM documents "
            f"WHERE doc_id IN ({', '.join(str(i) for i in got)})"
        )
    )
    assert got == want


def test_simhash_pairs_close_docs(spark):
    rows = [
        (0, "spark engine tile mercator join raster vector index"),
        (1, "spark engine tile mercator join raster vector indexes"),
        (2, "unrelated totally different content entirely elsewhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.simhash_pairs(df, max_hamming=8).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in ids


def test_connected_components_known_graph(spark):
    """Label propagation vs hand-known components, including a chain (tests
    multi-round convergence) and a singleton-pair."""
    from gdal_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (4, 5)],
        "id_a long, id_b long",
    )
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in connected_components(pairs).collect()}
    assert {rows[i] for i in (1, 2, 3, 4, 5)} == {(1, 5)}
    assert rows[10] == (10, 2) and rows[11] == (10, 2)
    assert {rows[i] for i in (20, 21, 22)} == {(20, 3)}


def test_connected_components_raises_on_nonconvergence(spark):
    """Regression (round-2 code review): a chain deeper than max_iter must
    RAISE, not silently return split components."""
    import pytest as _pt

    from gdal_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with _pt.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=3).collect()
    # and with enough budget it converges fine
    out = connected_components(pairs, max_iter=15)
    assert out.filter("cluster_id = 0").count() == 13


def test_decontaminate_flags_ngram_overlap(spark):
    from gdal_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with different words entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog again")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["bench_id"]): r["n_shared"]
           for r in decontaminate(corpus, bench, min_shared=3).collect()}
    assert (1, 100) in out and out[(1, 100)] >= 3
    assert not any(d == 2 for d, _ in out)

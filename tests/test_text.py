"""Per-suite invariants for the text-analysis operators (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators import text as T
from tests.conftest import SF_SMALL


def test_langid_covers_every_doc_once(spark):
    n_docs = table(spark, SF_SMALL, "documents").count()
    out = T.doc_langid(spark, SF_SMALL)
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_quality_scores_bounded(spark):
    out = T.doc_quality(spark, SF_SMALL)
    numeric = [f.name for f in out.schema.fields
               if f.dataType.typeName() in ("double", "float")]
    for c in numeric:
        assert out.filter(F.col(c).isNull()).count() == 0, c


def test_token_counts_positive(spark):
    out = T.doc_tokens(spark, SF_SMALL)
    cnt_col = [c for c in out.columns if "token" in c or c.startswith("n_")][0]
    assert out.filter(F.col(cnt_col) <= 0).count() == 0


def test_pack_sequences_chunks_are_contiguous(spark):
    out = T.doc_pack_sequences(spark, SF_SMALL)
    assert out.filter(F.col("chunk_offset") < 0).count() == 0
    assert out.filter(F.col("chunk_offset") >= T.PACK_CHUNK).count() == 0


def test_resample_mixture_downsamples_majority_sources(spark):
    docs = table(spark, SF_SMALL, "documents")
    before = {r["source"]: r["count"]
              for r in docs.groupBy("source").count().collect()}
    after = {r["source"]: r["count"]
             for r in T.doc_resample_mixture(spark, SF_SMALL)
             .groupBy("source").count().collect()}
    m = min(before.values())
    for src, n in after.items():
        assert n <= before[src]
        # each source lands near the minority count (hash thinning)
        assert n <= m * 1.5 + 10


def test_short_doc_guards_match_oracle(spark, tmp_path):
    """Pathological documents (empty text, 1 word, < N-gram width,
    1-char punctuation pretokens) must neither crash Spark's sequence()
    (whose (1, 0) bounds DESCEND, unlike DuckDB's empty
    generate_series) nor diverge from the DuckDB oracle."""
    import duckdb

    import __spark_entry__ as entrymod

    rows = [
        (1, "", "en", "web", 0),
        (2, "one", "en", "web", 3),
        (3, "just four tiny words", "en", "web", 20),
        (4, "end. a b. c , x", "en", "web", 15),
        (5, "five words are here now exactly repeated five words are here now exactly repeated", "en", "web", 81),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    for name in ("doc_chunk_sliding", "doc_repeated_ngrams",
                 "doc_bpe_pair_counts"):
        sdf = entrymod.queries()[name](spark, sf_dir)
        srows = sorted(tuple(r) for r in sdf.collect())
        res = con.execute(entrymod.oracle_sql()[name])
        ocols = [d[0] for d in res.description]
        # align duckdb column order to spark's
        idx = [ocols.index(c) for c in sdf.columns]
        orows = sorted(tuple(r[i] for i in idx) for r in res.fetchall())
        assert srows == orows, name
    # geometry sanity: empty doc → no chunks; 4-word doc → no 5-grams
    chunks = entrymod.queries()["doc_chunk_sliding"](spark, sf_dir)
    assert chunks.filter("doc_id = 1").count() == 0
    grams = entrymod.queries()["doc_repeated_ngrams"](spark, sf_dir)
    reps = {r.gram for r in grams.collect()}
    assert all("just four" not in g for g in reps)


def test_curation_pipeline_all_reasons(spark, tmp_path):
    """Every branch of the composed verdict fires: exact duplicates
    drop with 'exact_dup' (keeper survives), short/low-quality docs
    with 'gopher', high-perplexity docs with 'perplexity', and the
    reason order is exact_dup > gopher > perplexity."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away to the green hills beyond the river")
    rows = [
        (1, base, "en", "web", len(base)),
        (2, base, "en", "web", len(base)),          # exact dup of 1
        (3, "too short", "en", "web", 9),            # gopher (n_words)
        (4, base + " extra tail words here", "en", "web", len(base) + 23),
        (5, "zq xv qj kz vx jq zx qv " * 3, "en", "web", 72),  # weird but 24 words → perplexity candidate
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    import __spark_entry__ as entrymod

    out = {r.doc_id: (r.keep, r.reason) for r in
           entrymod.queries()["doc_curation_pipeline"](spark, sf_dir).collect()}
    # doc 1 shares doc 2's text and ALSO sits above the perplexity
    # tercile (a corpus-self-trained LM scores natural text higher
    # than repeated junk) — doc 2 still reports exact_dup, proving the
    # reason precedence; doc 1, the md5 keeper, falls through to the
    # later gates
    assert out[2] == (False, "exact_dup")
    assert out[1][1] in (None, "perplexity")
    assert out[3] == (False, "gopher")
    reasons = {r for _, r in out.values()}
    assert "perplexity" in reasons           # tercile drops someone
    assert any(k for k, _ in out.values())


def test_vocab_growth_curve_shape(spark, tmp_path):
    """A corpus that introduces fresh terms later in doc_id order must
    show them in later deciles with a monotone cumulative curve."""
    rows = [(i, f"common filler w{i // 10}", "en", "web", 20)
            for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    import __spark_entry__ as entrymod

    out = {r.decile: (r.new_terms, r.cum_vocab) for r in
           entrymod.queries()["doc_vocab_growth"](spark, sf_dir).collect()}
    # decile 0 carries 'common','filler','w0'; every decile d>=1 adds
    # exactly its one fresh wN term
    assert out[0] == (3, 3)
    for d in range(1, 10):
        assert out[d][0] == 1
    assert out[9][1] == 12
    curve = [out[d][1] for d in sorted(out)]
    assert curve == sorted(curve)

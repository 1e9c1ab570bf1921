"""Python UDTF surface (Spark 4 table functions, SURVEY §2.9): the
stateful sentence-boundary chunker with overlap carry."""

from pyspark.sql import functions as F

from boann_ocsf_security_data_platform_spark.functions.udtf_fns import SentenceChunks


def _chunks(spark, text, max_chars):
    spark.udtf.register("sentence_chunks", SentenceChunks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    df.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"SELECT c.* FROM _udtf_docs, "
        f"LATERAL sentence_chunks(text, {max_chars}) c"
    ).collect()


def test_chunks_respect_sentence_boundaries(spark):
    text = "Alpha beta gamma. Delta epsilon. Zeta eta theta. Iota kappa."
    rows = _chunks(spark, text, 30)
    assert all(r.chunk.rstrip(".!?").strip() for r in rows)
    for r in rows:
        # chunks never cut inside a sentence: every chunk is a join of
        # whole sentences from the source
        for s in r.chunk.split(". "):
            assert s.rstrip(".") in text


def test_chunks_have_overlap_carry(spark):
    text = "One two three. Four five six. Seven eight nine."
    rows = sorted(_chunks(spark, text, 20), key=lambda r: r.chunk_idx)
    assert len(rows) >= 2
    for prev, nxt in zip(rows, rows[1:]):
        last_sentence = prev.chunk.split(". ")[-1].rstrip(".")
        assert nxt.chunk.startswith(last_sentence.rstrip("."))


def test_oversized_sentence_is_own_chunk(spark):
    long_sentence = "word " * 50  # 250 chars, no boundary
    text = "Short one. " + long_sentence.strip() + ". Short two."
    rows = _chunks(spark, text, 40)
    assert any(len(r.chunk) > 40 for r in rows)


def test_null_and_empty_text_yield_no_rows(spark):
    spark.udtf.register("sentence_chunks", SentenceChunks)
    df = spark.createDataFrame(
        [(1, None), (2, "   ")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("_udtf_docs2")
    out = spark.sql(
        "SELECT c.* FROM _udtf_docs2, LATERAL sentence_chunks(text, 50) c"
    )
    assert out.count() == 0


def test_lateral_join_keeps_doc_id(spark):
    spark.udtf.register("sentence_chunks", SentenceChunks)
    df = spark.createDataFrame(
        [(7, "A b c. D e f."), (8, "G h i.")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("_udtf_docs3")
    rows = spark.sql(
        "SELECT doc_id, c.chunk_idx, c.chunk FROM _udtf_docs3, "
        "LATERAL sentence_chunks(text, 100) c"
    ).collect()
    assert {r.doc_id for r in rows} == {7, 8}

"""End-to-end LLM-data-pipeline integration: documents → curate →
hash-embed → IVF index build → search finds the expected neighbor.

This is the "a user could run the whole pipeline" proof: every stage
is the same library code the oracle-checked entries and CLIs drive,
composed the way a real pretraining data flow composes them."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_documents_to_searchable_index(spark, tmp_path):
    from pqstream_spark.curate import curate
    from pqstream_spark.functions.embeddings import embed_documents
    from pqstream_spark.queries.llm import (
        ivf_cell_expr,
        search_ivf_index,
        train_ivf_codebook_from,
    )
    from pqstream_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").selectExpr(
        "doc_id", "lang", "text"
    )
    # plant a near-copy: after curation+embedding, searching with its
    # vector must find the original as the top hit
    probe_src, probe_id = 11, 900011
    docs = docs.unionAll(
        docs.where(f"doc_id = {probe_src}").selectExpr(
            f"{probe_id} AS doc_id", "lang",
            "substring(text, 1, greatest(length(text) - 5, 1)) AS text",
        )
    )

    # 1. curate (no near-dedup: we WANT the planted near-copy kept so
    #    it can be used as the query; mixture off via the full frame)
    cur = curate(docs)
    kept = cur.where("kept").select("doc_id")
    kept_docs = docs.join(kept, "doc_id")
    n_kept = kept_docs.count()
    assert n_kept > 100

    # 2. embed (signed feature hashing — real classical embeddings)
    emb = embed_documents(kept_docs.select("doc_id", "text"), dim=64)
    assert emb.count() == n_kept
    # embeddings are deterministic: same doc -> same vector
    again = embed_documents(kept_docs.select("doc_id", "text"), dim=64)
    a = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    b = {r["vec_id"]: r["embedding"] for r in again.collect()}
    assert a == b

    # 3. index build
    cb = train_ivf_codebook_from(emb)
    assert cb, "codebook trained"
    index = emb.selectExpr(
        "vec_id", "embedding", f"{ivf_cell_expr(cb)} AS cell"
    )

    # 4. search with the planted near-copy's vector
    queries = emb.where(f"vec_id = {probe_id}").selectExpr(
        "vec_id AS q_id", "embedding"
    )
    if queries.count() == 0:
        # the near-copy itself failed curation on this corpus — use
        # the original as probe and expect the copy instead
        queries = emb.where(f"vec_id = {probe_src}").selectExpr(
            "vec_id AS q_id", "embedding"
        )
        want = probe_id
    else:
        want = probe_src
    hits = search_ivf_index(index, queries, cb, k=3).collect()
    assert hits, "search returned no candidates"
    top = min(hits, key=lambda r: r["rn"])
    assert top["c_id"] == want, (
        f"nearest neighbor of the near-copy should be its original: "
        f"{[(r['c_id'], r['cos']) for r in sorted(hits, key=lambda r: r['rn'])]}"
    )
    assert top["cos"] > 0.8, "near-copies share most tokens"


def test_pg_cdc_to_curated_ann_corpus(spark, tmp_path):
    """The engine's whole thesis in one test (round 11, VERDICT r10
    #7): a live PostgreSQL `documents` table, logical-replication
    capture, the STREAMING curation gate consuming the changelog, and
    an ANN-searchable corpus at the end. A novel quality INSERT is
    admitted into the corpus + index; an UPDATE that turns a document
    into a near-copy of corpus content is rejected as a near-dup."""
    import pytest

    from pqstream_spark.sources.outbox_pg import PsqlRunner, pg_available

    if not pg_available():
        pytest.skip("PostgreSQL server binaries not installed")

    from pqstream_spark.functions.embeddings import embed_documents
    from pqstream_spark.queries.llm import (
        ivf_cell_expr,
        search_ivf_index,
        train_ivf_codebook_from,
    )
    from pqstream_spark.sources.logical_datasource import LogicalDataSource
    from pqstream_spark.sources.logical_pg import PgLogicalCaptureManager
    from pqstream_spark.sources.outbox_pg import EphemeralPostgres
    from pqstream_spark.sources.tables import load_table
    from pqstream_spark.streaming.stateful import curate_ingest

    corpus = load_table(spark, SF_SMOKE, "documents").selectExpr(
        "doc_id", "text")
    # the near-copy source text, SQL-escaped for the UPDATE below
    src_text = corpus.where("doc_id = 5").collect()[0]["text"]
    near_copy = src_text[: max(len(src_text) - 7, 1)].replace("'", "''")
    novel = ("qwxv zebra cdc ingest " + "the a and of is " * 40).strip()

    srv = EphemeralPostgres.temp("pq_cdc_e2e_")
    srv.initdb()
    srv.start()
    try:
        r = srv.createdb("corp")
        r.sql("CREATE TABLE documents (id bigint PRIMARY KEY, "
              "lang text, body text);")
        PgLogicalCaptureManager(
            r, slot="pq_cdc", table_regexp="documents").install()
        spark.dataSource.register(LogicalDataSource)
        stream = (
            spark.readStream.format("pqstream_logical")
            .option("url", f"postgres:{srv.conninfo('corp')}")
            .option("slot", "pq_cdc")
            .option("tableRegexp", "documents")
            .load()
        )
        docs_stream = stream.where(
            "op IN ('INSERT', 'UPDATE')"
        ).selectExpr(
            "CAST(id AS BIGINT) AS doc_id",
            "get_json_object(payload_json, '$.lang') AS lang",
            "get_json_object(payload_json, '$.body') AS text",
        )
        epochs: list[list] = []

        def emit(df, epoch):
            rows = df.collect()
            if rows:
                epochs.append(rows)

        q = curate_ingest(docs_stream, corpus, emit,
                          checkpoint_dir=str(tmp_path / "ckpt"))
        try:
            # batch 1: a novel quality doc and a second novel doc
            r.sql(f"INSERT INTO documents VALUES "
                  f"(990100, 'en', '{novel}'), "
                  f"(990200, 'en', '{novel} second original');")
            q.processAllAvailable()
            # batch 2: the UPDATE turns 990200 into a corpus near-copy
            r.sql(f"UPDATE documents SET body = '{near_copy}' "
                  "WHERE id = 990200;")
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        srv.destroy()

    assert len(epochs) >= 2, "INSERTs and the UPDATE must arrive separately"
    first = {r["doc_id"]: r for batch in epochs[:-1] for r in batch}
    last = {r["doc_id"]: r for r in epochs[-1]}
    # the novel INSERT is admitted (quality text, no corpus match)
    assert first[990100]["admitted"] and not first[990100]["near_dup"]
    assert first[990200]["admitted"]
    # the near-dup UPDATE is REJECTED by the band index
    assert last[990200]["near_dup"] and not last[990200]["admitted"], last

    # admitted docs land in the corpus and are ANN-searchable: index
    # corpus ∪ admitted, then search with a PROBE embedding of the same
    # text under a different id (the search excludes self-matches) —
    # the admitted CDC document must come back as the nearest neighbor
    assert first[990100]["admitted"]
    admitted = spark.createDataFrame([(990100, novel)],
                                     "doc_id long, text string")
    full = corpus.unionAll(admitted)
    emb = embed_documents(full.select("doc_id", "text"), dim=64)
    cb = train_ivf_codebook_from(emb)
    index = emb.selectExpr("vec_id", "embedding",
                           f"{ivf_cell_expr(cb)} AS cell")
    probe = embed_documents(
        spark.createDataFrame([(999999, novel)], "doc_id long, text string"),
        dim=64,
    ).selectExpr("vec_id AS q_id", "embedding")
    hits = search_ivf_index(index, probe, cb, k=1).collect()
    assert hits and hits[0]["c_id"] == 990100 and hits[0]["cos"] > 0.999, (
        f"the admitted CDC document must be retrievable: {hits}")

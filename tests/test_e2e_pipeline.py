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

"""Incremental corpus curation e2e: streaming ingest with exact
dedup-against-history must converge to the batch-mode dedup of the full
input, and replaying a batch must be a no-op (idempotent commits)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.functions.text import md5_long
from real_time_flight_data_pipeline_spark.sources.parquet import load_table
from real_time_flight_data_pipeline_spark.streaming.corpus import (
    CorpusStore,
    run_file_replay_corpus,
)

SF = "/root/testdata/sf0.001"


def _input_docs(spark):
    """Documents plus re-keyed copies of every 4th doc — cross-batch and
    in-batch exact duplicates for the dedup to catch."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    dups = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source"
    )
    return docs.unionByName(dups)


def test_streaming_corpus_dedup_matches_batch(spark, tmp_path):
    """Contract: exactly one accepted row per distinct text fingerprint,
    the representative is a genuine member of that fingerprint's input
    doc set, and every distinct fingerprint is present. Which member wins
    is FIRST-ARRIVAL (in-batch ties broken by lowest doc_id) — arrival
    order across micro-batches is the streaming semantics, so the batch
    global-min is deliberately NOT asserted here (the idempotency test
    pins determinism for a fixed arrival order)."""
    docs = _input_docs(spark)
    src = tmp_path / "src"
    docs.repartition(3).write.mode("overwrite").parquet(str(src))

    store = CorpusStore(spark, str(tmp_path / "corpus"))
    run_file_replay_corpus(
        spark, str(src), store, str(tmp_path / "ckpt"), docs.schema
    )

    accepted = store.read().select("fingerprint", "doc_id").collect()
    fp_all = docs.withColumn("fingerprint", md5_long(F.col("text")))
    members = {}
    for r in fp_all.select("fingerprint", "doc_id").collect():
        members.setdefault(r.fingerprint, set()).add(r.doc_id)

    got_fps = [r.fingerprint for r in accepted]
    assert sorted(got_fps) == sorted(members)  # all fingerprints, once each
    for r in accepted:
        assert r.doc_id in members[r.fingerprint]
    # Duplicates existed and were dropped.
    assert len(accepted) < docs.count()


def test_ingest_batch_replay_is_idempotent(spark, tmp_path):
    docs = _input_docs(spark)
    store = CorpusStore(spark, str(tmp_path / "corpus"))
    s1 = store.ingest_batch(docs)
    assert s1.n_accepted > 0
    first = sorted(map(tuple, store.read().collect()))
    s2 = store.ingest_batch(docs)  # full replay of the same batch
    second = sorted(map(tuple, store.read().collect()))
    assert first == second
    # The replay appended NOTHING (idempotent-by-fingerprint): every
    # representative classified replayed (same ids re-sent), none accepted.
    assert s2.n_accepted == 0
    assert s2.n_replayed == s1.n_accepted
    assert s2.n_rows == s1.n_rows


def _near_dup_input(spark):
    """Documents plus exact copies (every 4th) and PERTURBED copies (every
    5th doc with two appended tokens — Jaccard vs the original well above
    the 0.5 detector threshold but a different fingerprint)."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    exact = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source"
    )
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz zzzz")).alias("text"),
        "lang",
        "source",
    )
    return docs.unionByName(exact).unionByName(near)


def test_near_dup_store_accepts_no_near_duplicates(spark, tmp_path):
    """Invariant check with the CATALOG's own batch detector: after
    streaming ingest through NearDupCorpusStore, running
    near_dup_pairs_from over the accepted corpus finds ZERO pairs — the
    store's screening and the batch detector agree on what a near-dup
    is. Also: near-dups were actually present and dropped."""
    from real_time_flight_data_pipeline_spark.plans.northstar import (
        near_dup_pairs_from,
    )
    from real_time_flight_data_pipeline_spark.functions import text as TX
    from real_time_flight_data_pipeline_spark.streaming.corpus import (
        NearDupCorpusStore,
        run_file_replay_corpus,
    )

    docs = _near_dup_input(spark)
    src = tmp_path / "src"
    docs.repartition(3).write.mode("overwrite").parquet(str(src))

    store = NearDupCorpusStore(spark, str(tmp_path / "ndstore"))
    run_file_replay_corpus(
        spark, str(src), store, str(tmp_path / "ckpt"), docs.schema
    )

    accepted = store.read()
    n_in, n_acc = docs.count(), accepted.count()
    assert 0 < n_acc < n_in  # something accepted, something dropped

    pairs = near_dup_pairs_from(
        accepted.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    ).collect()
    assert pairs == [], f"accepted corpus still contains near-dups: {pairs[:5]}"

    # Nearly all perturbed copies are gone. NOT all: MinHash-LSH recall is
    # below 1 by design (4 bands x 2 rows miss a j~0.8 pair with p~1.2%;
    # doc 480's pair is a deterministic miss at these parameters), and the
    # store's contract is agreement with the detector — asserted above —
    # not perfect recall. 100 perturbed copies went in; allow a handful of
    # deterministic LSH misses to coexist with their originals.
    ids = {r.doc_id for r in accepted.select("doc_id").collect()}
    coexisting = [i for i in ids if i + 200000 in ids]
    assert len(coexisting) <= 5, coexisting


def test_near_dup_store_replay_is_idempotent(spark, tmp_path):
    from real_time_flight_data_pipeline_spark.streaming.corpus import (
        NearDupCorpusStore,
    )

    docs = _near_dup_input(spark)
    store = NearDupCorpusStore(spark, str(tmp_path / "ndstore"))
    store.ingest_batch(docs)
    first = sorted(map(tuple, store.read().collect()))
    store.ingest_batch(docs)
    second = sorted(map(tuple, store.read().collect()))
    assert first == second


def test_ingest_quality_gate_rejects_before_dedup(spark, tmp_path):
    """A gated-out document must never claim a fingerprint: if a short
    (rejected) doc and a later acceptable doc share text... they can't by
    construction, so assert the two observable properties instead: gated
    docs are absent, and gating does not disturb dedup of accepted docs."""
    from real_time_flight_data_pipeline_spark.functions import text as TX
    from real_time_flight_data_pipeline_spark.streaming.corpus import (
        CorpusStore,
    )

    docs = _input_docs(spark)
    gate = lambda df: TX.token_count(F.col("text")) >= 12
    store = CorpusStore(spark, str(tmp_path / "gated"), accept=gate)
    store.ingest_batch(docs)

    accepted = store.read()
    n_short_in = docs.filter(TX.token_count(F.col("text")) < 12).count()
    assert n_short_in > 0  # the gate had something to reject
    assert accepted.filter(TX.token_count(F.col("text")) < 12).count() == 0
    # Accepted set == gated batch deduped exactly (one row per fingerprint).
    kept = docs.filter(TX.token_count(F.col("text")) >= 12)
    n_fp = kept.select(F.md5("text")).distinct().count()
    assert accepted.count() == n_fp


def test_ingest_decontamination_prefilter(spark, tmp_path):
    """Join-shaped gate: benchmark decontamination composed into ingest
    via the prefilter hook — documents sharing an 8-gram with the eval
    excerpts are rejected before dedup. The rejected set must equal the
    catalog decontamination query's flagged doc set (same gram logic)."""
    from real_time_flight_data_pipeline_spark.functions import text as TX
    from real_time_flight_data_pipeline_spark.plans.llm_ext import (
        _DECON_N,
        _decon_bench_grams,
    )
    from real_time_flight_data_pipeline_spark.streaming.corpus import (
        CorpusStore,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    all_toks = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    ).localCheckpoint(eager=False)
    bench = _decon_bench_grams(all_toks).localCheckpoint(eager=True)

    def decon(batch):
        grams = batch.select(
            "doc_id",
            F.explode(
                TX.shingles(TX.tokens(F.col("text")), _DECON_N)
            ).alias("g"),
        ).select("doc_id", TX.md5_long(F.col("g")).alias("gh"))
        contaminated = grams.join(
            F.broadcast(bench), "gh", "semi"
        ).select("doc_id").distinct()
        return batch.join(contaminated, "doc_id", "left_anti")

    store = CorpusStore(spark, str(tmp_path / "decon"), prefilter=decon)
    store.ingest_batch(docs)
    accepted_ids = {r.doc_id for r in store.read().select("doc_id").collect()}

    flagged = {
        r.doc_id
        for r in docs.select(
            "doc_id",
            F.explode(
                TX.shingles(TX.tokens(F.col("text")), _DECON_N)
            ).alias("g"),
        )
        .select("doc_id", TX.md5_long(F.col("g")).alias("gh"))
        .join(F.broadcast(bench), "gh", "semi")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert flagged, "no contaminated docs in fixture — test is vacuous"
    assert accepted_ids.isdisjoint(flagged)
    # Every clean doc's text is represented (exact dedup may collapse
    # clean duplicates, so compare distinct texts, not ids).
    clean_texts = {
        r.text
        for r in docs.join(
            spark.createDataFrame(
                [(i,) for i in flagged], "doc_id long"
            ),
            "doc_id",
            "left_anti",
        ).collect()
    }
    accepted_texts = {r.text for r in store.read().collect()}
    assert accepted_texts == clean_texts

"""Stream==batch parity for the FULL curation policy (r13 verdict #2):
the funnel's per-document gates (quality, decontamination) run inside the
streaming store's ingest hooks, the near-dup stage is the store's
dedup-against-history tier, and after draining N micro-batch increments
the accepted corpus must agree with the batch policy over the same input:

- GATES exactly: every accepted doc passes quality + decontamination, and
  (exactness) every gated doc that nothing could dedup away IS accepted;
- EXACT tier: no two accepted docs share a text fingerprint;
- NEAR-DUP tier: zero verified near-dup pairs among accepted docs (the
  batch detector's own parameters, run over the store), and every
  connected component of the gated corpus's near-dup graph — the unit the
  batch keep-best keeps one representative of — contains at least one
  accepted doc. First-arrival (not keep-best) picks WHICH member
  survives; the covered components are identical, so a dup-free input
  yields exact set equality (asserted);
- replaying the final increment is a no-op (T3 idempotence).

Stage-order note (documented in streaming/curation.py): the batch
reference applies both per-document gates BEFORE the near-dup graph —
per-doc predicates commute, but gating first is the production order (a
rejected doc must never claim a fingerprint or band bucket).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.functions import text as TX
from real_time_flight_data_pipeline_spark.plans.llm_ext import (
    _decon_bench_grams,
    decontaminate_from,
    near_dup_clusters_from,
)
from real_time_flight_data_pipeline_spark.plans.northstar import (
    near_dup_pairs_from,
    quality_filter_from,
)
from real_time_flight_data_pipeline_spark.sources.parquet import load_table
from real_time_flight_data_pipeline_spark.streaming.corpus import (
    NearDupCorpusStore,
    run_file_replay_corpus,
)
from real_time_flight_data_pipeline_spark.streaming.curation import (
    curated_store_gates,
)

SF = "/root/testdata/sf0.001"


def _input_docs(spark):
    """Documents plus exact re-keys (every 4th) and appended-token near
    copies (every 5th) — both dup tiers exercised across micro-batches."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    exact = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text", "lang", "source"
    )
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 200_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz qq")).alias("text"),
        "lang",
        "source",
    )
    return docs.unionByName(exact).unionByName(near)


def _toks(df):
    return df.select("doc_id", "text", TX.tokens(F.col("text")).alias("toks"))


def _batch_reference(spark, docs):
    """(gated doc_ids, components) of the batch policy: quality AND
    not-contaminated, then the near-dup graph over the gated docs."""
    toks = _toks(docs).localCheckpoint(eager=False)
    bench = _decon_bench_grams(toks.select("doc_id", "toks"))
    quality = quality_filter_from(toks).select("doc_id")
    cont = decontaminate_from(toks.select("doc_id", "toks"), bench).select(
        "doc_id"
    )
    gated = (
        toks.join(quality, "doc_id", "semi")
        .join(cont, "doc_id", "left_anti")
        .localCheckpoint(eager=False)
    )
    pairs = near_dup_pairs_from(gated.select("doc_id", "toks")).select(
        "a_id", "b_id"
    )
    clusters = near_dup_clusters_from(pairs)  # (doc_id, cluster_id)
    return bench, gated, clusters


def test_streaming_curation_matches_batch_policy(spark, tmp_path):
    docs = _input_docs(spark)
    bench, gated, clusters = _batch_reference(spark, docs)
    gated_ids = {r.doc_id for r in gated.select("doc_id").collect()}
    comp = {}
    for r in clusters.collect():
        comp.setdefault(r.cluster_id, set()).add(r.doc_id)
    clustered_ids = set().union(*comp.values()) if comp else set()
    assert comp, "input must exercise the near-dup tier"

    accept, prefilter = curated_store_gates(bench)
    store = NearDupCorpusStore(
        spark, str(tmp_path / "c"), accept=accept, prefilter=prefilter
    )
    # a REAL availableNow file-replay stream drains the increments through
    # the production driver (compaction between triggers included)
    src = tmp_path / "src"
    docs.repartition(3).write.mode("overwrite").parquet(str(src))
    run_file_replay_corpus(
        spark, str(src), store, str(tmp_path / "ckpt"), docs.schema
    )
    accepted = store.read().localCheckpoint(eager=True)
    accepted_ids = {r.doc_id for r in accepted.select("doc_id").collect()}

    # gates hold exactly
    assert accepted_ids <= gated_ids
    fps = [r.fingerprint for r in accepted.select("fingerprint").collect()]
    assert len(fps) == len(set(fps))  # exact-tier invariant

    # near-dup invariant: the batch detector finds nothing in the store
    assert near_dup_pairs_from(
        _toks(accepted).select("doc_id", "toks")
    ).isEmpty()

    # component coverage: the units batch keep-best retains are identical
    for cid, members in comp.items():
        assert members & accepted_ids, f"cluster {cid} lost entirely"

    # exactness outside the dup graph: a gated doc with a unique
    # fingerprint and no near-dup edge has nothing to drop it
    fp_counts = {
        r.fingerprint: r.n
        for r in _toks(gated)
        .select("doc_id", TX.md5_long(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    gated_fps = {
        r.doc_id: r.fingerprint
        for r in gated.select(
            "doc_id", TX.md5_long(F.col("text")).alias("fingerprint")
        ).collect()
    }
    loners = {
        d
        for d in gated_ids - clustered_ids
        if fp_counts[gated_fps[d]] == 1
    }
    assert loners <= accepted_ids
    assert loners, "input must contain undropable docs"

    # replaying the whole input is a no-op (T3 idempotence with the full
    # policy active)
    s = store.ingest_batch(docs)
    assert s.n_accepted == 0
    assert {
        r.doc_id for r in store.read().select("doc_id").collect()
    } == accepted_ids
    # and the gates actually rejected something along the way
    assert len(gated_ids) < docs.count()


def test_dup_free_gated_input_is_exact_equality(spark, tmp_path):
    """With no exact or near dups in the input, streaming accept ==
    batch keep set, id for id."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    bench, gated, _clusters = _batch_reference(spark, docs)
    pairs = near_dup_pairs_from(_toks(gated).select("doc_id", "toks"))
    dup_ids = {
        r.i
        for r in pairs.selectExpr("a_id AS i")
        .unionByName(pairs.selectExpr("b_id AS i"))
        .collect()
    }
    clean = docs.join(
        spark.createDataFrame([(int(i),) for i in dup_ids] or [(-1,)], "doc_id long"),
        "doc_id",
        "left_anti",
    )
    bench2, gated2, _ = _batch_reference(spark, clean)
    accept, prefilter = curated_store_gates(bench2)
    store = NearDupCorpusStore(
        spark, str(tmp_path / "c"), accept=accept, prefilter=prefilter
    )
    for i in range(2):
        store.ingest_batch(clean.filter(F.pmod(F.col("doc_id"), F.lit(2)) == i))
    assert {r.doc_id for r in store.read().select("doc_id").collect()} == {
        r.doc_id for r in gated2.select("doc_id").collect()
    }


def test_curated_store_with_deletes_matches_banked_twin(spark, tmp_path):
    """The banked r16 spec twin (plans/llm_ext.q_docs_curated_ingest) IS
    the store's behavior: drive a REAL NearDupCorpusStore with the
    curation gates through the twin's exact planted scenario — curated
    history plus four synthetic accepted docs, two of them then
    tombstone-DELETED — and assert the store's accept decisions match the
    twin's classification, with every planted status realized as
    physical presence/absence.

    The one modeled divergence: the store self-near-dup-dedups its
    HISTORY at ingest (first-arrival keeps one member per verified pair)
    while the twin's oracle models history as the full gated raw set —
    so the store's dedup screens are weaker SUBSETS of the twin's, and
    the exact relationship is containment: the store accepts everything
    the twin accepts, and may additionally accept a doc the twin
    classified near_dup/dup_hist against a history doc the store itself
    dropped. Gates, the exact tier's in-batch race, the tombstone
    deltas, and all planted rows agree exactly."""
    from real_time_flight_data_pipeline_spark.plans.llm_ext import (
        _CURATED_T1,
        _CURATED_T2,
        _CURATED_T3,
        _CURATED_T4,
        _CURATED_T5,
        _CURATED_TOMBSTONED,
        q_docs_curated_ingest,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    toks = _toks(docs).select("doc_id", "toks")
    bench = _decon_bench_grams(toks).localCheckpoint(eager=True)
    accept, prefilter = curated_store_gates(bench)
    store = NearDupCorpusStore(
        spark, str(tmp_path / "c"), accept=accept, prefilter=prefilter
    )

    def synth(rows):
        return spark.createDataFrame(
            [(i, t, "en", "synth") for i, t in rows],
            "doc_id long, text string, lang string, source string",
        )

    hist = docs.filter(F.col("doc_id") % 10 != 9).unionByName(
        synth(
            [
                (8_000_001, _CURATED_T1),
                (8_000_002, _CURATED_T2),
                (8_000_003, _CURATED_T4),
                (8_000_004, _CURATED_T5),
            ]
        )
    )
    hs = store.ingest_batch(hist)
    assert hs.n_near_dup > 0  # the history-model divergence IS exercised
    assert store.delete_docs(list(_CURATED_TOMBSTONED)) == 2

    batch = docs.filter(F.col("doc_id") % 10 == 9).unionByName(
        synth(
            [
                (8_000_001, _CURATED_T1),          # resurrection
                (8_000_002, _CURATED_T2),          # replayed
                (9_000_001, _CURATED_T5),          # dup_hist
                (9_000_002, _CURATED_T4),          # dead content, new id
                (9_000_003, _CURATED_T2 + " zq"),  # near_dup
                (9_000_004, _CURATED_T3),          # accepted
                (9_000_005, _CURATED_T3),          # dup_batch
                (9_000_006, "zz zz zz"),           # rejected
            ]
        )
    ).unionByName(
        docs.filter(F.col("doc_id") == 0).select(
            F.lit(9_000_007).cast("long").alias("doc_id"),
            "text",
            "lang",
            "source",
        )  # contaminated
    )
    before = {r.doc_id for r in store.read().select("doc_id").collect()}
    bs = store.ingest_batch(batch)
    after = {r.doc_id for r in store.read().select("doc_id").collect()}

    twin = {
        r.doc_id: r.status
        for r in q_docs_curated_ingest(spark, SF).collect()
    }
    twin_accepted = {i for i, s in twin.items() if s == "accepted"}
    added = after - before
    # containment parity: the store admits every twin-accepted row...
    assert twin_accepted <= added
    # ...and anything extra is exactly the modeled divergence — a doc the
    # twin dropped against a history doc the store's self-dedup removed
    extra = added - twin_accepted
    assert all(twin[i] in ("near_dup", "dup_hist") for i in extra), {
        i: twin[i]
        for i in sorted(extra)
        if twin[i] not in ("near_dup", "dup_hist")
    }
    assert bs.n_accepted == len(added)
    assert bs.n_resurrected == 1  # 8_000_001 came back by cancellation
    # every planted status realized as physical presence/absence
    assert 8_000_001 in after and 9_000_002 in after and 9_000_004 in after
    for gone in (9_000_001, 9_000_003, 9_000_005, 9_000_006, 9_000_007):
        assert gone not in after
    # replay converges (T3 under the full policy + deletes)
    rs = store.ingest_batch(batch)
    assert rs.n_accepted == 0

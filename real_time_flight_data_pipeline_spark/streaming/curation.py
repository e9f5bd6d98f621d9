"""The FULL curation policy inside the streaming loop (r13 verdict #2).

The batch catalog ships the curation funnel as one declarative plan
(plans/llm_ext.q_curation_funnel: C4-style language/quality filter ->
near-dup keep-best -> benchmark decontamination) over a CLOSED corpus.
The production shape at 100 TB is the same policy applied per micro-batch
as documents arrive: the per-document gates run INSIDE the corpus store's
ingest scan (CorpusStore.accept / .prefilter — no extra job), and the
near-dup stage IS the store's dedup-against-history tier
(NearDupCorpusStore). This module wires the funnel's stages into those
two hooks so one policy definition serves both paths, and the
stream==batch parity is pinned by tests/test_streaming_curation.py.

Stage-order note: the batch funnel REPORTS quality -> near-dup -> decon
(the dashboard order); the streaming policy applies both per-document
gates (quality, decontamination) BEFORE the near-dup tier. For
per-document predicates the order cannot change which documents pass,
but it does change the near-dup graph: a contaminated document never
enters the band index, so it can no longer "absorb" a clean near-copy
that the funnel's keep-best might have kept in its place and then lost
to decontamination. Gates-first is the correct production order — a
rejected document must never claim a fingerprint or a band bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX

QUALITY_MIN_SCORE = 0.75
QUALITY_LANG = "en"


def quality_accept(df: DataFrame) -> Column:
    """The funnel's language/quality stage as a per-row gate (the
    ``accept`` hook: one boolean Column evaluated inside the ingest scan
    — same predicate as plans/northstar.quality_filter_from)."""
    toks = TX.tokens(F.col("text"))
    return (TX.quality_score_from(F.col("text"), toks) >= QUALITY_MIN_SCORE) & (
        TX.lang_id_from(toks) == QUALITY_LANG
    )


def decontamination_prefilter(bench_grams: DataFrame):
    """The funnel's benchmark-decontamination stage as a ``prefilter``
    hook (join-shaped: an anti join against the broadcast benchmark
    gram-hash set, exactly the batch pass of plans/llm_ext.
    decontaminate_from). ``bench_grams`` is the FIXED benchmark set —
    one column ``gh`` of gram hashes — known up front in production;
    the returned transform only FILTERS (the prefilter contract)."""
    bench = bench_grams.localCheckpoint(eager=False)

    def prefilter(df: DataFrame) -> DataFrame:
        from ..plans.llm_ext import decontaminate_from  # noqa: PLC0415 — cycle

        toks = df.select(
            "doc_id", TX.tokens(F.col("text")).alias("toks")
        ).localCheckpoint(eager=False)
        cont = decontaminate_from(toks, bench).select("doc_id")
        # shuffle_hash: both sides are batch-derived; at corpus-scale
        # micro-batches neither may be statically broadcast.
        return df.join(cont.hint("shuffle_hash"), "doc_id", "left_anti")

    return prefilter


def curated_store_gates(bench_grams: DataFrame):
    """(accept, prefilter) pair wiring the funnel's per-document stages
    into a CorpusStore/NearDupCorpusStore — the near-dup stage is the
    store itself:

        store = NearDupCorpusStore(spark, root,
                                   accept=accept, prefilter=prefilter)
    """
    return quality_accept, decontamination_prefilter(bench_grams)

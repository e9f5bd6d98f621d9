"""Property-based tests (hypothesis) for the algebraic invariants.

Each property batches several generated cases into one small DataFrame per
example so the Spark-job count stays bounded: examples are capped and
derandomized (fixed corpus per run — CI-deterministic), and every assert
is a mathematical invariant of the operator, not a golden value:

- Winnowing (Schleimer SIGMOD'03 §3): any common substring of length
  >= w + k - 1 between two documents yields at least one shared
  fingerprint. This is the guarantee the near-dup blocking relies on.
- merge_upsert is idempotent under every MergePolicy: applying the same
  source batch twice equals applying it once (the exactly-once-replay
  foundation, T3).
- merge_upsert with GREATEST is batch-order commutative (the M4
  ingest_time column cannot depend on micro-batch arrival order).
- MinHash over a union of shingle sets is the min of the per-set
  MinHashes (the identity that makes per-partition partial minhash
  aggregation correct at 100 TB).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.functions import text as TX
from real_time_flight_data_pipeline_spark.operators.merge import MergePolicy, merge_upsert

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ALPHA = "abcd"  # tiny alphabet: collisions likely, properties one-directional
_W = TX.WINNOW_W
_K = TX.WINNOW_K
_GUARANTEE = _W + _K - 1  # winnowing detection threshold (8 chars)

_text = st.text(alphabet=_ALPHA, min_size=0, max_size=30)
_shared = st.text(alphabet=_ALPHA, min_size=_GUARANTEE + 4, max_size=24)


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(_text, _text, _text, _text, _shared), min_size=2, max_size=5
    )
)
def test_winnow_shared_substring_shares_fingerprint(spark, pairs):
    rows = [
        (i, p1 + c + s1, p2 + c + s2) for i, (p1, s1, p2, s2, c) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows, "pair_id long, a string, b string")
    fp = lambda col: TX.winnow_mins(TX.char_gram_hashes(F.col(col)))  # noqa: E731
    out = df.select(
        "pair_id", F.size(F.array_intersect(fp("a"), fp("b"))).alias("n_shared")
    ).collect()
    for r in out:
        assert r.n_shared >= 1, (
            f"pair {r.pair_id}: {_GUARANTEE + 4}-char shared substring "
            "produced no shared winnow fingerprint"
        )


@settings(**_SETTINGS)
@given(
    arrs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=9),  # tiny range: min ties
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_winnow_mins_doubling_matches_per_window_form(spark, arrs):
    """r12: winnow_mins moved from an O(n*w) slice-per-window to a
    doubling ladder of zip_with passes; the selected fingerprint SET must
    be identical for every length, including the n_h < w tail collapse
    and empty arrays (the oracle SQL still states the per-window form)."""

    def ref(hs, w=TX.WINNOW_W):
        if not hs:
            return []
        n_w = max(len(hs) - w + 1, min(len(hs), 1))
        return sorted({min(hs[j : j + w]) for j in range(n_w)})

    rows = [(i, a) for i, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "i long, hs array<long>")
    got = {
        r.i: sorted(r.fps)
        for r in df.select(
            "i", TX.winnow_mins(F.col("hs")).alias("fps")
        ).collect()
    }
    assert got == {i: ref(a) for i, a in rows}


_batch = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (small: forces collisions)
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),  # val
        st.integers(min_value=0, max_value=1000),  # ts
    ),
    min_size=1,
    max_size=8,
)


def _dedup_latest(rows):
    best = {}
    for k, v, ts in rows:
        if k not in best or ts >= best[k][2]:
            best[k] = (k, v, ts)
    return list(best.values())


@settings(**_SETTINGS)
@given(target=_batch, source=_batch, policy=st.sampled_from(list(MergePolicy)))
def test_merge_upsert_idempotent_for_every_policy(spark, target, source, policy):
    schema = "k long, val long, ts long"
    tgt = spark.createDataFrame(_dedup_latest(target), schema)
    src = spark.createDataFrame(_dedup_latest(source), schema)
    policies = {"val": policy, "ts": MergePolicy.GREATEST}
    once = merge_upsert(tgt, src, ["k"], policies)
    twice = merge_upsert(once, src, ["k"], policies)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@settings(**_SETTINGS)
@given(target=_batch, b1=_batch, b2=_batch)
def test_merge_greatest_batch_order_commutative(spark, target, b1, b2):
    schema = "k long, ts long"
    tgt = spark.createDataFrame([(k, ts) for k, _, ts in _dedup_latest(target)], schema)
    s1 = spark.createDataFrame([(k, ts) for k, _, ts in _dedup_latest(b1)], schema)
    s2 = spark.createDataFrame([(k, ts) for k, _, ts in _dedup_latest(b2)], schema)
    pol = {"ts": MergePolicy.GREATEST}
    ab = merge_upsert(merge_upsert(tgt, s1, ["k"], pol), s2, ["k"], pol)
    ba = merge_upsert(merge_upsert(tgt, s2, ["k"], pol), s1, ["k"], pol)
    assert sorted(map(tuple, ab.collect())) == sorted(map(tuple, ba.collect()))


_shingle_list = st.lists(
    st.text(alphabet=_ALPHA, min_size=1, max_size=6), min_size=1, max_size=8
)


@settings(**_SETTINGS)
@given(
    cases=st.lists(st.tuples(_shingle_list, _shingle_list), min_size=2, max_size=5),
    seed=st.integers(min_value=0, max_value=7),
)
def test_minhash_union_is_min_of_minhashes(spark, cases, seed):
    rows = [(i, a, b) for i, (a, b) in enumerate(cases)]
    df = spark.createDataFrame(rows, "case_id long, a array<string>, b array<string>")
    mh = lambda col: TX.minhash_value(F.col(col), seed)  # noqa: E731
    out = df.select(
        "case_id",
        TX.minhash_value(F.concat(F.col("a"), F.col("b")), seed).alias("mh_union"),
        F.least(mh("a"), mh("b")).alias("min_of_mh"),
    ).collect()
    for r in out:
        assert r.mh_union == r.min_of_mh, f"case {r.case_id}: {r}"


# ---------------------------------------------------------------------------
# BPE greedy merge application: the distributed window formulation
# (candidate flags -> run starts -> offset parity) must equal the
# sequential left-to-right non-overlapping rule. Tiny alphabet forces
# overlapping candidate runs ("a a a a"), the case the parity logic exists
# for.
# ---------------------------------------------------------------------------
def _greedy_merge_ref(toks, l, r):
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
            out.append(f"{l}+{r}")
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    ),
    pair=st.sampled_from([("a", "a"), ("a", "b"), ("b", "a")]),
)
def test_bpe_apply_matches_sequential_greedy(spark, docs, pair):
    from real_time_flight_data_pipeline_spark.plans.llm_ext import (
        bpe_apply_merge,
    )

    l, r = pair
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, toks array<string>"
    )
    top = spark.createDataFrame([(l, r, 1)], "l string, r string, cnt long")
    got = {
        row.doc_id: row.toks
        for row in bpe_apply_merge(df, top).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _greedy_merge_ref(d, l, r), (i, d, l, r, got[i])


# ---------------------------------------------------------------------------
# SCD2 incremental apply (r7): batch-split invariance. Folding an
# event-time-ordered stream through scd2_apply must produce the SAME
# history regardless of where the stream is cut into micro-batches — and
# that history must equal the one-shot batch rebuild. This is the
# algebraic reason the streaming sink (scd2_state.Scd2State) is correct
# under any trigger cadence.
# ---------------------------------------------------------------------------
from real_time_flight_data_pipeline_spark.operators.scd2 import scd2_apply
from real_time_flight_data_pipeline_spark.plans.relational_ext import (
    user_state_scd2_from,
)


@settings(**_SETTINGS)
@given(data=st.data())
def test_scd2_fold_is_batch_split_invariant(spark, data):
    import datetime as dt

    n_events = data.draw(st.integers(min_value=1, max_value=12), label="n")
    states = data.draw(
        st.lists(
            st.sampled_from(["view", "click", "purchase"]),
            min_size=n_events,
            max_size=n_events,
        ),
        label="states",
    )
    n_users = data.draw(st.integers(min_value=1, max_value=3), label="users")
    # strictly increasing ts per user (the fold's ordering contract);
    # event_id doubles as the tie column and stays globally unique
    rows = [
        (
            eid % n_users,
            s,
            dt.datetime(2024, 1, 1) + dt.timedelta(hours=eid),
            eid,
        )
        for eid, s in enumerate(states)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    ).localCheckpoint(eager=True)

    # random ordered split of the GLOBALLY time-sorted stream into batches
    cuts = data.draw(
        st.sets(st.integers(min_value=1, max_value=n_events - 1))
        if n_events > 1
        else st.just(set()),
        label="cuts",
    )
    bounds = [0, *sorted(cuts), n_events]
    ordered = sorted(rows, key=lambda r: (r[2], r[3]))

    state = spark.createDataFrame(
        [],
        "user_id long, version int, state string, "
        "valid_from timestamp, valid_to timestamp",
    )
    for lo, hi in zip(bounds, bounds[1:]):
        batch = spark.createDataFrame(
            [(r[0], r[1], r[2], r[3]) for r in ordered[lo:hi]],
            "user_id long, state string, ts timestamp, event_id long",
        )
        state = scd2_apply(
            state, batch, tie_cols=("event_id",)
        ).localCheckpoint(eager=True)

    got = sorted(map(tuple, state.collect()))
    want = sorted(
        map(
            tuple,
            user_state_scd2_from(ev)
            .select("user_id", "version", "state", "valid_from", "valid_to")
            .collect(),
        )
    )
    assert got == want

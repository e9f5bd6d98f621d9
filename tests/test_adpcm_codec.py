"""IMA ADPCM (functions/codecs.py) — the compressed-AUDIO real decode
(r16; r19 bank candidate per COVERAGE.md). The codec invariant under
test is bit-exactness: ADPCM is lossy toward its input, but a decoder
must reproduce the ENCODER'S OWN reconstruction exactly; and the oracle
novelty is that DuckDB runs the same per-sample state machine with a
recursive CTE, so the Spark query still gets an exact value-hash
compare despite the codec being stateful and non-algebraic."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from real_time_flight_data_pipeline_spark.functions.codecs import (
    _ADPCM_INDEX,
    _ADPCM_STEPS,
    adpcm_ima_decode,
    adpcm_ima_encode,
)

from .conftest import SF_CORRECT
from .oracle_harness import compare


def test_decode_matches_encoder_reconstruction_bit_exact():
    rng = np.random.default_rng(11)
    for trial in range(5):
        n = int(rng.integers(1, 400))
        x = rng.integers(-32768, 32768, n).astype(np.int16)
        p0 = int(rng.integers(-32768, 32768))
        i0 = int(rng.integers(0, 89))
        payload, recon = adpcm_ima_encode(x, predictor=p0, step_index=i0)
        dec, pred, idx = adpcm_ima_decode(payload)
        assert (dec == recon).all()
        assert pred == int(recon[-1])
        assert 0 <= idx <= 88


def test_single_nibble_hand_computed():
    """One transition checked against the IMA spec arithmetic by hand:
    pred=0, step_index=0 (step=7), nibble 7 (magnitude bits 1+2+4, no
    sign): diff = 7>>3 + 7>>2 + 7>>1 + 7 = 0+1+3+7 = 11, predictor 11,
    index 0+8 = 8."""
    payload = struct.pack("<hBH", 0, 0, 1) + bytes([7])
    dec, pred, idx = adpcm_ima_decode(payload)
    assert list(dec) == [11] and pred == 11 and idx == 8
    # sign bit: nibble 15 = same magnitude, negative direction
    payload = struct.pack("<hBH", 0, 0, 1) + bytes([15])
    dec, pred, idx = adpcm_ima_decode(payload)
    assert list(dec) == [-11] and pred == -11 and idx == 8


def test_clamps_and_index_walk_bounds():
    # drive the predictor into the int16 ceiling: all-max positive nibbles
    x = np.full(200, 32767, dtype=np.int16)
    payload, recon = adpcm_ima_encode(x)
    dec, pred, idx = adpcm_ima_decode(payload)
    assert (dec == recon).all()
    assert dec.max() <= 32767 and idx <= 88
    assert len(_ADPCM_STEPS) == 89 and len(_ADPCM_INDEX) == 16


def test_odd_sample_count_pads_high_nibble():
    x = np.array([100, -50, 7], dtype=np.int16)  # 3 samples -> 2 bytes
    payload, recon = adpcm_ima_encode(x)
    assert len(payload) == 5 + 2
    dec, _, _ = adpcm_ima_decode(payload)
    assert (dec == recon).all() and len(dec) == 3


def test_strict_errors():
    with pytest.raises(ValueError, match="truncated"):
        adpcm_ima_decode(b"\x00\x00")
    good, _ = adpcm_ima_encode(np.arange(10, dtype=np.int16))
    with pytest.raises(ValueError, match="need"):
        adpcm_ima_decode(good[:-1])
    with pytest.raises(ValueError, match="need"):
        adpcm_ima_decode(good + b"\x00")
    bad_idx = struct.pack("<hBH", 0, 93, 2) + b"\x00"
    with pytest.raises(ValueError, match="step index"):
        adpcm_ima_decode(bad_idx)


def test_adpcm_query_oracle_match(spark):
    """The recursive-CTE oracle compare at the driver's SF — exact
    value-hash equality for a stateful codec."""
    from real_time_flight_data_pipeline_spark.plans.northstar import (
        _multimodal_adpcm_oracle,
        q_multimodal_adpcm,
    )

    ok, msg = compare(
        spark, SF_CORRECT, q_multimodal_adpcm, _multimodal_adpcm_oracle()
    )
    assert ok, msg


def test_adpcm_query_planted_pin(spark):
    """vec 0's features recomputed here straight from the codec,
    independent of both the oracle SQL and the Spark stage."""
    from real_time_flight_data_pipeline_spark.plans.northstar import (
        _ADPCM_N,
        q_multimodal_adpcm,
    )

    nibs = [(0 * 7 + j * 3) % 16 for j in range(_ADPCM_N)]
    body = bytearray()
    for j in range(0, _ADPCM_N, 2):
        body.append(nibs[j] | (nibs[j + 1] << 4))
    payload = struct.pack("<hBH", -32768, 0, _ADPCM_N) + bytes(body)
    samples, pred, idx = adpcm_ima_decode(payload)
    s = samples.astype("int64")

    rows = {r.vec_id: r for r in q_multimodal_adpcm(
        spark, "/root/testdata/sf0.001").collect()}
    r = rows[0]
    assert r.final_predictor == pred and r.final_index == idx
    assert r.sum_abs == int(abs(s).sum())
    assert (r.max_sample, r.min_sample) == (int(s.max()), int(s.min()))


def test_adpcm_query_plan_gates(spark):
    from real_time_flight_data_pipeline_spark.plans.northstar import (
        q_multimodal_adpcm,
    )

    df = q_multimodal_adpcm(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan


def test_encode_rejects_clips_over_u16():
    with pytest.raises(ValueError, match="u16"):
        adpcm_ima_encode(np.zeros(65536, dtype=np.int16))

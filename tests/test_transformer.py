"""W6 transformer-CRF decode-given-weights gates.

The torch reference cannot run here, so (same recipe as W2/test_crf) the
vectorized float32 kernels are property-tested against a scalar float32
transcription of the reference math (functions/transformer_crf.py cites
transformer_ner.py line-by-line), plus brute-force path enumeration for
the forward algorithm and a Spark-plumbing end-to-end check."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from hmm_crf_ner_fromscratch_spark.functions.transformer_crf import (
    TransformerCRFParams,
    crf_forward_batch,
    crf_gold_score_batch,
    crf_viterbi_batch,
    oracle_decode,
    oracle_forward,
)
from hmm_crf_ner_fromscratch_spark.operators.transformer import (
    decode_transformer_crf,
    synth_emissions,
    synth_params,
)


def _rand_params(rng, K, quantize=False):
    def draw(shape):
        x = rng.uniform(-2, 2, size=shape)
        if quantize:  # coarse grid -> frequent exact ties, stressing
            x = np.round(x)  # first-index-wins tie-breaking
        return x.astype(np.float32)

    return TransformerCRFParams(
        draw((K, K)), draw((K,)), draw((K,)), [f"T{j}" for j in range(K)]
    )


def test_decode_property_vs_oracle():
    """200 random (params, batch) cases, half on a coarse grid to force
    ties: batched vectorized decode == scalar oracle, path for path."""
    rng = np.random.default_rng(7)
    for case in range(200):
        K = int(rng.integers(2, 7))
        T = int(rng.integers(1, 12))
        B = int(rng.integers(1, 5))
        quantize = case % 2 == 0
        p = _rand_params(rng, K, quantize)
        E = rng.uniform(-2, 2, size=(B, T, K))
        if quantize:
            E = np.round(E)
        E = E.astype(np.float32)
        got = crf_viterbi_batch(E, p)
        for b in range(B):
            want = oracle_decode(E[b], p)
            assert got[b].tolist() == want, (case, b)


def test_forward_matches_oracle_and_bruteforce():
    """Masked batched forward == scalar oracle on each sequence's own
    length, and == logsumexp over ALL K^T explicitly enumerated paths."""
    rng = np.random.default_rng(11)
    K, Tmax = 3, 5
    lengths = [5, 3, 1, 4]
    B = len(lengths)
    p = _rand_params(rng, K)
    E = rng.uniform(-1.5, 1.5, size=(B, Tmax, K)).astype(np.float32)
    mask = np.zeros((B, Tmax), dtype=bool)
    for b, L in enumerate(lengths):
        mask[b, :L] = True
    logz = crf_forward_batch(E, mask, p)
    for b, L in enumerate(lengths):
        want = oracle_forward(E[b, :L], p)
        assert abs(float(logz[b]) - float(want)) < 1e-4, b
        # brute force: enumerate all K^L paths in float64
        scores = []
        for path in itertools.product(range(K), repeat=L):
            s = float(p.start_transitions[path[0]]) + float(E[b, 0, path[0]])
            for t in range(1, L):
                s += float(p.transitions[path[t - 1], path[t]]) + float(E[b, t, path[t]])
            s += float(p.end_transitions[path[-1]])
            scores.append(s)
        m = max(scores)
        brute = m + np.log(sum(np.exp(np.array(scores) - m)))
        assert abs(float(logz[b]) - brute) < 1e-3, b


def test_gold_score_and_decode_consistency():
    """Gold score of the decoded path == the Viterbi max score, and
    logZ >= gold score for any path (masked batch)."""
    rng = np.random.default_rng(23)
    K, T, B = 4, 6, 3
    p = _rand_params(rng, K)
    E = rng.uniform(-1, 1, size=(B, T, K)).astype(np.float32)
    mask = np.ones((B, T), dtype=bool)
    paths = crf_viterbi_batch(E, p)
    gold = crf_gold_score_batch(E, paths, mask, p)
    logz = crf_forward_batch(E, mask, p)
    assert np.all(logz >= gold - 1e-4)
    # decoded-path score equals the max over enumerated paths (K^T small)
    for b in range(B):
        best = max(
            float(
                crf_gold_score_batch(
                    E[b : b + 1],
                    np.array([path]),
                    mask[b : b + 1],
                    p,
                )[0]
            )
            for path in itertools.product(range(K), repeat=T)
        )
        assert abs(float(gold[b]) - best) < 1e-4


def test_spark_decode_end_to_end(spark):
    """The mapInPandas operator over synthetic emissions reproduces the
    kernel row-for-row; fixtures are md5-deterministic (integer-valued
    float32 -> exact arithmetic)."""
    K = 4
    p = synth_params(K)
    df = synth_emissions(spark, 60, K)
    rows = decode_transformer_crf(df, p).collect()
    assert len(rows) == 60
    by_id = {r.seq_id: r for r in rows}
    for sid in (0, 7, 33):
        r = by_id[sid]
        E = np.array([list(tok) for tok in r.emissions], dtype=np.float32)
        want = [p.tags[j] for j in oracle_decode(E, p)]
        assert r.tags_pred == want, sid
        assert len(r.tags_pred) == len(r.emissions)
    # determinism across runs
    again = {r.seq_id: r.tags_pred for r in decode_transformer_crf(df, p).collect()}
    for sid, r in by_id.items():
        assert again[sid] == r.tags_pred


def test_params_roundtrip(tmp_path):
    p = synth_params(5, seed=9)
    p.save(str(tmp_path / "m"))
    q = TransformerCRFParams.load(str(tmp_path / "m"))
    assert np.array_equal(p.transitions, q.transitions)
    assert np.array_equal(p.start_transitions, q.start_transitions)
    assert np.array_equal(p.end_transitions, q.end_transitions)
    assert p.tags == q.tags

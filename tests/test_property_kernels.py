"""Hypothesis property suites for the pure (no-Spark) kernels: span
assembly vs the independent oracle across arbitrary BIO/BMES tag streams
(orphan I-/M-/E- tags, type switches mid-span, S- singletons, empty
sequences), and single-vs-batched Viterbi equivalence on adversarial
(tie-heavy) models. These complement the fixed-seed loops elsewhere with
shrinking counterexample search."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hmm_crf_ner_fromscratch_spark.functions.mentions import extract_spans_batch
from hmm_crf_ner_fromscratch_spark.functions.viterbi import (
    viterbi_batch,
    viterbi_single,
)
from tests.test_transcripts_mentions import spans_oracle

TYPES = ["PER", "ORG", "LOC"]
BIO_TAGS = ["O"] + [f"{p}-{t}" for p in "BI" for t in TYPES]
BMES_TAGS = ["O"] + [f"{p}-{t}" for p in "BMES" for t in TYPES]


def _spans_from_batch(token_lists, tag_lists, scheme):
    rows, starts, ends, types_, surfaces = extract_spans_batch(
        token_lists, tag_lists, scheme=scheme
    )
    out: dict[int, list] = {i: [] for i in range(len(token_lists))}
    for r, s, e, ty, surf in zip(rows, starts, ends, types_, surfaces):
        out[int(r)].append((int(s), int(e), ty, surf))
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(BIO_TAGS), min_size=0, max_size=12),
        min_size=1,
        max_size=5,
    )
)
def test_bio_spans_match_oracle(tag_lists):
    token_lists = [[f"w{i}" for i in range(len(t))] for t in tag_lists]
    got = _spans_from_batch(token_lists, tag_lists, "bio")
    for i, (toks, tags) in enumerate(zip(token_lists, tag_lists)):
        assert got[i] == spans_oracle(toks, tags, scheme="bio"), (toks, tags)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(BMES_TAGS), min_size=0, max_size=12),
        min_size=1,
        max_size=5,
    )
)
def test_bmes_spans_match_oracle(tag_lists):
    token_lists = [[f"w{i}" for i in range(len(t))] for t in tag_lists]
    got = _spans_from_batch(token_lists, tag_lists, "bmes")
    for i, (toks, tags) in enumerate(zip(token_lists, tag_lists)):
        assert got[i] == spans_oracle(toks, tags, scheme="bmes"), (toks, tags)


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_viterbi_batch_equals_single(data):
    """Batched DP == per-sentence DP, including on coarse integer-valued
    models where score ties are common (first-index tie-break parity)."""
    K = data.draw(st.integers(2, 6))
    T = data.draw(st.integers(1, 10))
    B = data.draw(st.integers(1, 4))
    coarse = data.draw(st.booleans())
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    draw = lambda shape: (
        np.round(rng.uniform(-2, 2, shape)) if coarse else rng.uniform(-2, 2, shape)
    )
    pi, A = draw(K), draw((K, K))
    E = draw((B, T, K))
    batch = viterbi_batch(E, pi, A)
    for b in range(B):
        assert batch[b].tolist() == viterbi_single(E[b], pi, A).tolist()


@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=60),
    st.integers(min_value=1, max_value=8),
    st.randoms(use_true_random=False),
)
def test_partitioned_xor_equals_global(hashes, n_parts, rng):
    """The content-defined snapshot invariant: XOR of per-partition XORs
    equals the global row XOR under ANY partitioning of the rows -- the
    algebra behind layout-blind snapshot ids (lineage.write_bucketed's
    per-bucket ledger, incremental/one-shot convergence, compaction and
    rebalance preserving snapshot ids)."""
    global_xor = 0
    for h in hashes:
        global_xor ^= h

    parts = [[] for _ in range(n_parts)]
    for h in hashes:
        parts[rng.randrange(n_parts)].append(h)
    ledger = []
    for p in parts:
        x = 0
        for h in p:
            x ^= h
        ledger.append(x)
    combined = 0
    for x in ledger:
        combined ^= x
    assert combined == global_xor

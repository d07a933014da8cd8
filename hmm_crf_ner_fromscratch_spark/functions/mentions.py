"""Span assembly from per-token tag sequences (BIO and BMES schemes).

Deterministic rules (no reference implementation exists -- the reference
stops at per-token tags; tag inventories per ``/root/reference/English/
tag.txt`` and ``Chinese/tag.txt``, eval label lists ``check.py:5-17``):

BIO (English): a mention is a maximal run ``B-X (I-X)*``. An orphan ``I-X``
(sentence-initial, after ``O``, or after a different type) *starts* a new
span -- the conventional CoNLL relaxation.

BMES (Chinese): ``B-X (M-X)* (E-X)?`` or a singleton ``S-X``. ``M-X``/
``E-X`` continue a span only when the previous token is ``B-X``/``M-X`` of
the same type; orphans start a new span. ``S-X`` and ``E-X`` close a span.

The kernel is flat-vectorized: a whole Arrow batch of tag arrays is
concatenated into one flat array, boundaries computed with NumPy/pandas
column ops, and only the (far fewer) resulting spans are materialized in a
Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def extract_spans_batch(
    token_lists: list, tag_lists: list, scheme: str = "bio"
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list, list]:
    """Extract mention spans from a batch of (tokens, tags) arrays.

    Returns (row_idx, span_start, span_end, entity_type, surface) arrays,
    one element per span; ``row_idx`` indexes into the input batch.
    """
    lengths = np.array([len(t) for t in tag_lists], dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            [],
            [],
        )
    row_id = np.repeat(np.arange(len(tag_lists), dtype=np.int64), lengths)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets, lengths)

    flat_tags = pd.Series(
        np.concatenate([np.asarray(t, dtype=object) for t in tag_lists if len(t)])
    )
    flat_toks = np.concatenate(
        [np.asarray(t, dtype=object) for t in token_lists if len(t)]
    )

    prefix = flat_tags.str.slice(0, 1).to_numpy()
    etype = flat_tags.str.slice(2).to_numpy()
    is_ent = (flat_tags != "O").to_numpy() & (flat_tags != "").to_numpy()

    same_row_as_prev = np.zeros(total, dtype=bool)
    same_row_as_prev[1:] = row_id[1:] == row_id[:-1]
    prev_is_ent = np.zeros(total, dtype=bool)
    prev_is_ent[1:] = is_ent[:-1]
    prev_type = np.empty(total, dtype=object)
    prev_type[0] = ""
    prev_type[1:] = etype[:-1]
    prev_prefix = np.empty(total, dtype=object)
    prev_prefix[0] = ""
    prev_prefix[1:] = prefix[:-1]

    if scheme == "bio":
        cont = (
            is_ent
            & (prefix == "I")
            & same_row_as_prev
            & prev_is_ent
            & (prev_type == etype)
        )
    elif scheme == "bmes":
        cont = (
            is_ent
            & np.isin(prefix, ("M", "E"))
            & same_row_as_prev
            & prev_is_ent
            & (prev_type == etype)
            & np.isin(prev_prefix, ("B", "M"))
        )
    else:
        raise ValueError(f"unknown scheme: {scheme}")
    start = is_ent & ~cont

    n_spans = int(start.sum())
    if n_spans == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            [],
            [],
        )
    sid = np.cumsum(start)
    first_idx = np.flatnonzero(start)
    ent_idx = np.flatnonzero(is_ent)
    svals = sid[ent_idx]  # nondecreasing over entity tokens
    last_idx = ent_idx[
        np.searchsorted(svals, np.arange(1, n_spans + 1), side="right") - 1
    ]

    span_row = row_id[first_idx]
    span_start = pos[first_idx]
    span_end = pos[last_idx] + 1
    span_type = [etype[i] for i in first_idx]
    surface = [
        " ".join(flat_toks[f : l + 1]) for f, l in zip(first_idx, last_idx)
    ]
    return span_row, span_start, span_end, span_type, surface

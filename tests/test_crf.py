"""M4 gates: CRF registry build vs independent key generation, vectorized
decode vs the pure-Python float32 oracle (property-tested), gradient
correctness vs finite differences, and end-to-end training improvement."""

from __future__ import annotations

import random

import numpy as np
import pytest

from hmm_crf_ner_fromscratch_spark.functions.crf import (
    B_TEMPLATES,
    START_TAG,
    STOP_TAG,
    U_TEMPLATES,
    CRFModel,
    DecodeTables,
    obs_string,
    oracle_decode,
    viterbi_decode_crf,
)
from hmm_crf_ner_fromscratch_spark.operators.crf import (
    _TrainTables,
    _sentence_grad,
    build_registry,
    decode_crf,
    train_crf,
)


def ref_style_keys(sentences):
    """Independent reference-shaped feature generation (gold-path scan in
    template order, then pure-B cross product) -- crf_ner.py:563-587."""
    keys = []
    seen = set()
    tags_seen = []

    def add(k):
        if k not in seen:
            seen.add(k)
            keys.append(k)

    for words, tags in sentences:
        for t in tags:
            if t not in tags_seen:
                tags_seen.append(t)
    for words, tags in sentences:
        for pos in range(len(words) + 1):
            cur = tags[pos] if pos < len(words) else STOP_TAG
            prev = tags[pos - 1] if pos > 0 else START_TAG
            for prefix, offs in U_TEMPLATES:
                add(f"{prefix}:{obs_string(words, pos, offs)}_{cur}")
            for prefix, offs in B_TEMPLATES:
                add(f"{prefix}:{obs_string(words, pos, offs)}_{prev}_{cur}")
            add(f"B:{prev}_{cur}")
    all_tags = tags_seen + [START_TAG, STOP_TAG]
    for prev in all_tags:
        for cur in all_tags:
            if prev == STOP_TAG or cur == START_TAG:
                continue
            add(f"B:{prev}_{cur}")
    return keys, tags_seen


TINY = [
    (["John", "lives", "in", "Paris"], ["B-PER", "O", "O", "B-LOC"]),
    (["Mary", "Smith", "visits", "London"], ["B-PER", "I-PER", "O", "B-LOC"]),
    (["in", "Paris"], ["O", "B-LOC"]),
]


@pytest.fixture(scope="module")
def tiny_df(spark):
    rows = [(i, list(w), list(t)) for i, (w, t) in enumerate(TINY)]
    return spark.createDataFrame(
        rows, "sent_id long, tokens array<string>, tags array<string>"
    )


def test_registry_matches_reference_generation(spark, tiny_df):
    model = build_registry(tiny_df)
    want_keys, want_tags = ref_style_keys(TINY)
    assert model.tags == want_tags
    got = sorted(model.feature_index, key=model.feature_index.get)
    assert got == want_keys
    # ids are dense 0..n-1
    assert sorted(model.feature_index.values()) == list(range(len(want_keys)))


def _random_model(rng, n_words=8, n_tags=3, n_sents=6, max_len=7):
    vocab = [f"w{i}" for i in range(n_words)]
    tagset = [f"T{i}" for i in range(n_tags)]
    sents = []
    for _ in range(n_sents):
        L = rng.randint(1, max_len)
        words = [rng.choice(vocab) for _ in range(L)]
        tags = [rng.choice(tagset) for _ in range(L)]
        sents.append((words, tags))
    keys, tags_seen = ref_style_keys(sents)
    fi = {k: i for i, k in enumerate(keys)}
    kinds, rule_idxs, obss, prevs, curs = [], [], [], [], []
    u_pref = {p: i for i, (p, _) in enumerate(U_TEMPLATES)}
    b_pref = {p: i for i, (p, _) in enumerate(B_TEMPLATES)}
    all_t = tags_seen + [START_TAG, STOP_TAG]
    for k in keys:
        prefix, _, rest = k.partition(":")
        if prefix == "B":
            # B:prev_cur with known tags
            found = None
            for pv in all_t:
                for cu in all_t:
                    if rest == f"{pv}_{cu}":
                        found = (pv, cu)
            prevs.append(found[0]); curs.append(found[1])
            kinds.append("BP"); rule_idxs.append(-1); obss.append("")
        elif prefix in u_pref:
            found = None
            for cu in all_t:
                if rest.endswith(f"_{cu}"):
                    found = (rest[: -len(cu) - 1], cu)
            obss.append(found[0]); curs.append(found[1])
            kinds.append("U"); rule_idxs.append(u_pref[prefix]); prevs.append("")
        else:
            found = None
            for pv in all_t:
                for cu in all_t:
                    if rest.endswith(f"_{pv}_{cu}"):
                        found = (rest[: -len(pv) - len(cu) - 2], pv, cu)
            obss.append(found[0]); prevs.append(found[1]); curs.append(found[2])
            kinds.append("BO"); rule_idxs.append(b_pref[prefix])
    w = (rng.random() for _ in range(len(keys)))
    weights = np.array([rng.uniform(-2, 2) for _ in range(len(keys))], dtype=np.float32)
    model = CRFModel(
        tags=tags_seen, feature_index=fi, kinds=kinds, rule_idxs=rule_idxs,
        obss=obss, prevs=prevs, curs=curs, weights=weights,
    )
    return model, sents, vocab


def test_decode_property_vs_oracle():
    """200 random (model, sentence) pairs: vectorized decode == oracle,
    path-for-path (float32, first-index tie-breaks); the batch decoder
    (memoized, used in production) must agree on the whole batch."""
    from hmm_crf_ner_fromscratch_spark.functions.crf import (
        viterbi_decode_crf_batch,
    )

    rng = random.Random(1234)
    for trial in range(20):
        model, sents, vocab = _random_model(rng)
        tables = DecodeTables(model)
        batch = []
        wants = []
        for _ in range(10):
            L = rng.randint(1, 9)
            # mix of seen and unseen words
            words = [
                rng.choice(vocab + ["unk1", "unk2"]) for _ in range(L)
            ]
            got = viterbi_decode_crf(words, tables)
            want = oracle_decode(
                words, model.weights, model.feature_index, model.tags
            )
            assert got == want, f"trial {trial}: {words}"
            batch.append(words)
            wants.append(want)
        batch.insert(3, [])  # empty sentence inside the batch
        wants.insert(3, [])
        assert viterbi_decode_crf_batch(batch, tables) == wants, f"batch {trial}"


def test_gradient_matches_finite_differences():
    rng = random.Random(7)
    model, sents, _ = _random_model(rng, n_words=5, n_tags=2, n_sents=3, max_len=4)
    tt = _TrainTables(model)
    words, tags = sents[0]
    w64 = model.weights.astype(np.float64)

    grad = np.zeros(model.n_features)
    loss0 = _sentence_grad(words, tags, tt, w64, grad)
    assert np.isfinite(loss0)

    eps = 1e-6
    # check a sample of feature dims incl each kind
    idxs = list(range(0, model.n_features, max(1, model.n_features // 25)))
    for fid in idxs:
        wp = w64.copy(); wp[fid] += eps
        wm = w64.copy(); wm[fid] -= eps
        gp = np.zeros(model.n_features)
        gm = np.zeros(model.n_features)
        lp = _sentence_grad(words, tags, tt, wp, gp)
        lm = _sentence_grad(words, tags, tt, wm, gm)
        num = (lp - lm) / (2 * eps)
        assert abs(num - grad[fid]) < 1e-4, (fid, num, grad[fid])


def test_train_crf_learns(spark, tiny_df):
    model, losses = train_crf(tiny_df, epochs=8, lr=0.5)
    assert losses[-1] < losses[0] * 0.6, losses
    decoded = decode_crf(tiny_df, model)
    rows = {r.sent_id: r.tags_pred for r in decoded.collect()}
    correct = sum(
        sum(p == g for p, g in zip(rows[i], TINY[i][1]))
        for i in range(len(TINY))
    )
    total = sum(len(t) for _, t in TINY)
    assert correct / total >= 0.9, (correct, total)


def test_train_crf_tail_averaging(spark, tiny_df):
    """average_from returns the exact mean of the per-epoch weight
    snapshots from that epoch onward (captured via epoch_callback)."""
    import numpy as np

    snaps = {}

    def cb(epoch, model, loss):
        snaps[epoch] = model.weights.astype(np.float64).copy()

    model, losses = train_crf(
        tiny_df, epochs=6, lr=0.5, epoch_callback=cb, average_from=4
    )
    assert len(losses) == 6 and set(snaps) == {1, 2, 3, 4, 5, 6}
    expected = np.mean([snaps[e] for e in (4, 5, 6)], axis=0).astype(
        np.float32
    )
    assert np.array_equal(model.weights, expected)


# ---------------------------------------------------------------------
# Extended template mode (shape/prefix/suffix generalization features)
# ---------------------------------------------------------------------


def ext_style_keys(sentences, u_tpls, b_tpls):
    """Independent key generation for arbitrary (prefix, offs, xform)
    template sets: gold-path scan in template order + pure-B products."""
    from hmm_crf_ner_fromscratch_spark.functions.crf import (
        apply_xform,
        word_at,
    )

    keys, seen, tags_seen = [], set(), []

    def add(k):
        if k not in seen:
            seen.add(k)
            keys.append(k)

    def obs(words, pos, offs, xf):
        return "/".join(apply_xform(word_at(words, pos + o), xf) for o in offs)

    for words, tags in sentences:
        for t in tags:
            if t not in tags_seen:
                tags_seen.append(t)
    for words, tags in sentences:
        for pos in range(len(words) + 1):
            cur = tags[pos] if pos < len(words) else STOP_TAG
            prev = tags[pos - 1] if pos > 0 else START_TAG
            for prefix, offs, xf in u_tpls:
                add(f"{prefix}:{obs(words, pos, offs, xf)}_{cur}")
            for prefix, offs, xf in b_tpls:
                add(f"{prefix}:{obs(words, pos, offs, xf)}_{prev}_{cur}")
            add(f"B:{prev}_{cur}")
    all_tags = tags_seen + [START_TAG, STOP_TAG]
    for prev in all_tags:
        for cur in all_tags:
            if prev == STOP_TAG or cur == START_TAG:
                continue
            add(f"B:{prev}_{cur}")
    return keys, tags_seen


def test_word_shape():
    from hmm_crf_ner_fromscratch_spark.functions.crf import word_shape

    assert word_shape("London") == "Xx"
    assert word_shape("McDonald's") == "XxXx'x"
    assert word_shape("1984") == "d"
    assert word_shape("U.N.") == "X.X."
    assert word_shape("re-elect") == "x-x"
    assert word_shape("") == ""


def test_extended_registry_matches_independent_generation(spark, tiny_df):
    from hmm_crf_ner_fromscratch_spark.functions.crf import (
        EXTENDED_U_TEMPLATES,
        normalize_templates,
    )

    model = build_registry(tiny_df, u_templates=EXTENDED_U_TEMPLATES)
    want_keys, want_tags = ext_style_keys(
        TINY, EXTENDED_U_TEMPLATES, normalize_templates(B_TEMPLATES)
    )
    assert model.tags == want_tags
    got = sorted(model.feature_index, key=model.feature_index.get)
    assert got == want_keys
    # shape features fire: John/Mary/Paris/London share shape Xx
    assert "US2:Xx_B-PER" in model.feature_index


def test_extended_generalizes_to_unseen_words(spark, tiny_df):
    """The point of the extended mode: an UNSEEN capitalized word after
    'in' should still be taggable via shape/context features, where the
    purely lexical reference templates see nothing."""
    from hmm_crf_ner_fromscratch_spark.functions.crf import (
        EXTENDED_U_TEMPLATES,
    )

    reg = build_registry(tiny_df, u_templates=EXTENDED_U_TEMPLATES)
    model, _ = train_crf(
        tiny_df, model=reg, epochs=40, lr=1.0, optimizer="adagrad"
    )
    test_df = spark.createDataFrame(
        [(0, ["John", "lives", "in", "Tokyo"])],
        "sent_id long, tokens array<string>",
    )
    out = decode_crf(test_df, model).first().tags_pred
    assert list(out) == ["B-PER", "O", "O", "B-LOC"]

    # save/load round-trips the template set and decode is identical
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        model.save(d)
        from hmm_crf_ner_fromscratch_spark.functions.crf import CRFModel as M

        m2 = M.load(d)
        assert m2.u_templates == model.u_templates
        out2 = decode_crf(test_df, m2).first().tags_pred
        assert list(out2) == list(out)


def test_build_obs_lists_equals_obs_string():
    """The padded-slice obs builder must agree with obs_string for every
    (template, position), across offsets, transforms, and short/empty
    sentences (the decode/train kernels rely on this equivalence)."""
    from hmm_crf_ner_fromscratch_spark.functions.crf import (
        EXTENDED_U_TEMPLATES,
        build_obs_lists,
        normalize_templates,
    )

    tpls = EXTENDED_U_TEMPLATES + normalize_templates(B_TEMPLATES)
    rng = random.Random(99)
    words_pool = ["EU", "rejects", "McDonald's", "1984", "U.N.", "a", "re-elect"]
    for _ in range(50):
        words = [rng.choice(words_pool) for _ in range(rng.randint(1, 9))]
        got = build_obs_lists(words, tpls)
        for r, (_, offs, xf) in enumerate(tpls):
            want = [obs_string(words, pos, offs, xf) for pos in range(len(words) + 1)]
            assert got[r] == want, (r, offs, xf, words)


def test_committed_dict_artifact_integrity(spark):
    """The crf_decode_dict oracle rests on the committed quantized
    artifact: weights must be exact integers within the float32-exact
    envelope (|wq| <= 512), the parquet sidecar must agree with the
    npy weights feature-for-feature, and decode with the artifact must
    emit only artifact tags."""
    import numpy as np
    import pyarrow.parquet as pq

    from hmm_crf_ner_fromscratch_spark.functions.crf import CRFModel
    from hmm_crf_ner_fromscratch_spark.operators.crf import decode_crf
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import _CRF_ART_DIR

    model = CRFModel.load(_CRF_ART_DIR)
    w = model.weights
    assert np.all(w == np.rint(w)), "artifact weights must be exact integers"
    assert float(np.max(np.abs(w))) <= 512
    side = pq.read_table(f"{_CRF_ART_DIR}/weights.parquet").to_pydict()
    assert len(side["key"]) == model.n_features
    for key, wq in zip(side["key"], side["wq"]):
        assert model.weights[model.feature_index[key]] == wq

    test_df = spark.createDataFrame(
        [("d", ["the", "query", "ran", "a", "scan"])],
        "doc_id string, tokens array<string>",
    )
    tags = decode_crf(test_df, model).first().tags_pred
    assert set(tags) <= set(model.tags)


def test_batch_grad_matches_sentence_grad():
    """The vectorized batch gradient must equal the per-sentence scalar
    kernel's accumulated gradient and loss on random models/batches
    (float64 summation order differs -> allclose, not bitwise)."""
    import numpy as np

    from hmm_crf_ner_fromscratch_spark.operators.crf import (
        _TrainTables,
        _batch_grad,
        _sentence_grad,
    )

    rng = random.Random(99)
    for trial in range(8):
        model, sents, vocab = _random_model(rng)
        tt = _TrainTables(model)
        w64 = model.weights.astype(np.float64)
        batch = []
        for _ in range(12):
            L = rng.randint(1, 9)
            words = [rng.choice(vocab + ["unkA", "unkB"]) for _ in range(L)]
            tags = [rng.choice(model.tags) for _ in range(L)]
            batch.append((words, tags))
        batch.insert(2, ([], []))  # empty sentence inside the batch

        g_ref = np.zeros(len(w64))
        loss_ref, n_ref = 0.0, 0
        for words, tags in batch:
            if not words:
                continue
            loss = _sentence_grad(list(words), list(tags), tt, w64, g_ref)
            if np.isfinite(loss):
                loss_ref += loss
                n_ref += 1

        g_new = np.zeros(len(w64))
        loss_new, n_new = _batch_grad(
            [w for w, _ in batch], [t for _, t in batch], tt, w64, g_new
        )
        assert n_new == n_ref, f"trial {trial}"
        assert np.isclose(loss_new, loss_ref, rtol=1e-9), (
            f"trial {trial}: {loss_new} vs {loss_ref}"
        )
        assert np.allclose(g_new, g_ref, rtol=1e-9, atol=1e-12), (
            f"trial {trial}: max diff "
            f"{np.abs(g_new - g_ref).max()}"
        )

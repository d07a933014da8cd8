"""Word-cluster operator gates: determinism, hierarchy shape, CRF
cluster-feature integration (Spark-built registry keys == kernel-built
keys, model save/load round-trip with cluster maps)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _tiny_corpus(spark):
    rows = []
    # two clear distributional classes: fruits after 'eat', tools after 'use'
    fruits = ["apple", "banana", "cherry", "plum"]
    tools = ["hammer", "wrench", "drill", "saw"]
    for i in range(40):
        f, t = fruits[i % 4], tools[i % 4]
        rows.append(("d", i, ["we", "eat", f, "today"], ["O", "O", "B-F", "O"]))
        rows.append(("d", i + 100, ["we", "use", t, "today"], ["O", "O", "B-T", "O"]))
    return spark.createDataFrame(
        rows, "doc_id string, sent_id long, tokens array<string>, tags array<string>"
    )


def test_clusters_deterministic_and_separating(spark):
    from hmm_crf_ner_fromscratch_spark.operators.clusters import (
        prefix_maps,
        train_word_clusters,
    )

    corpus = _tiny_corpus(spark)
    bits = train_word_clusters(corpus, n_context=10, depth=6)
    assert bits == train_word_clusters(corpus, n_context=10, depth=6)
    # distributional classes must separate at SOME prefix depth: fruits
    # (context 'eat _') and tools (context 'use _') end up in disjoint
    # subtrees before the hierarchy bottoms out
    separated = False
    for depth in range(1, 7):
        fruit_bits = {bits[w][:depth] for w in ("apple", "banana", "cherry", "plum")}
        tool_bits = {bits[w][:depth] for w in ("hammer", "wrench", "drill", "saw")}
        if fruit_bits.isdisjoint(tool_bits):
            separated = True
            break
    assert separated, {w: bits[w] for w in bits}
    maps = prefix_maps(bits, lengths=(2, 4))
    assert set(maps) == {"c2", "c4"}
    assert maps["c2"]["apple"] == bits["apple"][:2]


def test_cluster_vocab_collect_guard(spark):
    """The vocab collect must refuse loudly when the vocabulary exceeds
    max_vocab -- the limit(cap+1) guard fires BEFORE an unbounded driver
    collect can OOM (same contract as train_hmm's max_model_rows)."""
    import pytest

    from hmm_crf_ner_fromscratch_spark.operators.clusters import context_counts

    corpus = _tiny_corpus(spark)  # vocab size 12 > cap 4
    with pytest.raises(ValueError, match="max_vocab"):
        context_counts(corpus, n_context=10, max_vocab=4)
    # and an adequate cap still returns the full vocab
    _, vocab_rows, _ = context_counts(corpus, n_context=10, max_vocab=100)
    assert len(vocab_rows) == 12


def test_cluster_features_spark_vs_kernel_keys(spark):
    """The registry built Spark-side (pandas-UDF cluster columns) must
    contain exactly the keys the Python kernel generates -- the same
    contract the shape xform is held to."""
    from hmm_crf_ner_fromscratch_spark.functions.crf import (
        build_feature_key,
        build_obs_lists,
        cluster_u_templates,
        normalize_templates,
        register_cluster_maps,
        B_TEMPLATES,
    )
    from hmm_crf_ner_fromscratch_spark.operators.clusters import (
        prefix_maps,
        train_word_clusters,
    )
    from hmm_crf_ner_fromscratch_spark.operators.crf import build_registry

    corpus = _tiny_corpus(spark)
    bits = train_word_clusters(corpus, n_context=10, depth=6)
    cmaps = prefix_maps(bits, lengths=(4, 6, 10))
    register_cluster_maps(cmaps)
    tpls = cluster_u_templates()
    registry = build_registry(corpus, u_templates=tpls)
    registry.cluster_maps = cmaps

    # independently regenerate the registry keys with the Python kernel
    u_tpls = normalize_templates(tpls)
    b_tpls = normalize_templates(B_TEMPLATES)
    all_tpls = u_tpls + b_tpls
    want = set()
    for row in corpus.orderBy("sent_id").collect():
        words, tags = list(row.tokens), list(row.tags)
        obs = build_obs_lists(words, all_tpls)
        path = ["<START>"] + tags + ["<STOP>"]
        for pos in range(len(words) + 1):
            cur, prev = path[pos + 1], path[pos]
            for r in range(len(u_tpls)):
                want.add(f"{u_tpls[r][0]}:{obs[r][pos]}_{cur}")
            for r in range(len(b_tpls)):
                want.add(
                    f"{b_tpls[r][0]}:{obs[len(u_tpls) + r][pos]}_{prev}_{cur}"
                )
    # pure-B cross-product keys (B:prev_cur) are added beyond gold paths;
    # compare everything else exactly
    non_pure = {k for k in registry.feature_index if not _is_pure_b(k)}
    want_non_pure = {k for k in want if not _is_pure_b(k)}
    assert non_pure == want_non_pure
    assert want - set(registry.feature_index) == set()


def _is_pure_b(key: str) -> bool:
    return key.startswith("B:")


def test_gazetteer_mining_and_decode(spark):
    """mine_gazetteer: word -> sorted type-set string, scheme prefix
    stripped; gaz templates train/decode/round-trip through the same
    model-carried map mechanism as clusters."""
    import tempfile

    import hmm_crf_ner_fromscratch_spark.functions.crf as fcrf
    from hmm_crf_ner_fromscratch_spark.functions.crf import (
        CRFModel,
        gazetteer_u_templates,
        register_cluster_maps,
        EXTENDED_U_TEMPLATES,
    )
    from hmm_crf_ner_fromscratch_spark.operators.crf import (
        build_registry,
        decode_crf,
        mine_gazetteer,
        train_crf,
    )

    corpus = _tiny_corpus(spark)
    gaz = mine_gazetteer(corpus)
    assert gaz["apple"] == "F" and gaz["hammer"] == "T"
    assert "we" not in gaz and "eat" not in gaz
    # a word inside spans of two types gets the joined sorted set
    two = corpus.unionByName(
        spark.createDataFrame(
            [("d", 999, ["we", "eat", "hammer"], ["O", "O", "B-F"])],
            "doc_id string, sent_id long, tokens array<string>, tags array<string>",
        )
    )
    assert mine_gazetteer(two)["hammer"] == "F|T"
    # BMES-style prefixes strip the same way
    bmes = spark.createDataFrame(
        [("d", 0, ["张", "三"], ["B-NAME", "E-NAME"])],
        "doc_id string, sent_id long, tokens array<string>, tags array<string>",
    )
    assert mine_gazetteer(bmes) == {"张": "NAME", "三": "NAME"}
    # bounded collect refuses loudly
    import pytest

    with pytest.raises(ValueError, match="max_vocab"):
        mine_gazetteer(corpus, max_vocab=3)

    # min_count masks infrequent entity words (train-time word dropout:
    # each entity word occurs exactly 10 times in the tiny corpus)
    assert mine_gazetteer(corpus, min_count=10)["hammer"] == "T"
    assert "hammer" not in mine_gazetteer(corpus, min_count=11)

    # end-to-end: gaz templates over the extended base (no clusters, keeps
    # the test fast), train, decode, save/load in a fresh-process simulation
    cmaps = {"gaz": gaz}
    register_cluster_maps(cmaps)
    tpls = gazetteer_u_templates(EXTENDED_U_TEMPLATES)
    registry = build_registry(corpus, u_templates=tpls)
    registry.cluster_maps = cmaps
    model, _ = train_crf(corpus, model=registry, epochs=2, lr=1.0, optimizer="adagrad")
    model.cluster_maps = cmaps
    test_df = spark.createDataFrame(
        [("x", ["we", "eat", "plum", "today"]), ("y", ["we", "use", "saw", "today"])],
        "doc_id string, tokens array<string>",
    )
    out1 = {r.doc_id: list(r.tags_pred) for r in decode_crf(test_df, model).collect()}
    assert out1["x"][2] == "B-F" and out1["y"][2] == "B-T"
    with tempfile.TemporaryDirectory() as d:
        model.save(d)
        fcrf.CLUSTER_MAPS.clear()
        m2 = CRFModel.load(d)
        assert m2.cluster_maps["gaz"] == gaz
        out2 = {r.doc_id: list(r.tags_pred) for r in decode_crf(test_df, m2).collect()}
        assert out1 == out2


def test_cluster_model_roundtrip_decode(spark):
    """Save/load with cluster_maps; decode must be identical and must not
    depend on process-global registration done by the training session."""
    import hmm_crf_ner_fromscratch_spark.functions.crf as fcrf
    from hmm_crf_ner_fromscratch_spark.functions.crf import (
        CRFModel,
        cluster_u_templates,
        register_cluster_maps,
    )
    from hmm_crf_ner_fromscratch_spark.operators.clusters import (
        prefix_maps,
        train_word_clusters,
    )
    from hmm_crf_ner_fromscratch_spark.operators.crf import (
        build_registry,
        decode_crf,
        train_crf,
    )

    corpus = _tiny_corpus(spark)
    cmaps = prefix_maps(train_word_clusters(corpus, n_context=10, depth=6))
    register_cluster_maps(cmaps)
    registry = build_registry(corpus, u_templates=cluster_u_templates())
    registry.cluster_maps = cmaps
    model, _ = train_crf(corpus, model=registry, epochs=2, lr=1.0, optimizer="adagrad")
    model.cluster_maps = cmaps

    test_df = spark.createDataFrame(
        [("x", ["we", "eat", "plum", "today"]), ("y", ["we", "use", "saw", "today"])],
        "doc_id string, tokens array<string>",
    )
    out1 = {r.doc_id: list(r.tags_pred) for r in decode_crf(test_df, model).collect()}
    assert out1["x"][2] == "B-F" and out1["y"][2] == "B-T"

    with tempfile.TemporaryDirectory() as d:
        model.save(d)
        fcrf.CLUSTER_MAPS.clear()  # simulate a fresh process
        m2 = CRFModel.load(d)
        assert m2.cluster_maps == cmaps
        out2 = {r.doc_id: list(r.tags_pred) for r in decode_crf(test_df, m2).collect()}
        assert out1 == out2

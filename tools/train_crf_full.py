"""Full-corpus CRF quality run (README parity target: validation F1).

Trains the CRF on the complete English CoNLL train set with Adagrad,
checkpointing the model and logging validation token accuracy + entity
micro-F1 (check.py semantics: labels exclude O) after each epoch.

Usage: python tools/train_crf_full.py [epochs] [lr] [out_dir] [l2] [mode]
                                      [avg_from] [corpus]
``corpus``: "English" (default) or "Chinese" (BMES resume corpus,
K=28 tags).
``mode``: "reference" (default, the 21 reference templates) or "extended"
(adds shape/lowercase/prefix/suffix unigram templates -- the quality mode
for unseen-entity generalization).
``avg_from``: if > 0, also maintain a tail-averaged weight vector (mean
of per-epoch weights from that epoch onward -- Polyak-style averaging,
which smooths the late-epoch oscillation Adagrad+L2 shows on this
objective) and evaluate/save it as ``model_avg``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    from hmm_crf_ner_fromscratch_spark.operators.crf import (
        build_registry,
        decode_crf,
        train_crf,
    )
    from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll
    from hmm_crf_ner_fromscratch_spark.session import get_spark

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/crf_full"
    l2 = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    mode = sys.argv[5] if len(sys.argv) > 5 else "reference"
    os.makedirs(out_dir, exist_ok=True)

    corpus = sys.argv[7] if len(sys.argv) > 7 else "English"

    spark = get_spark(app_name="crf-full", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    train = read_conll(
        spark, f"/root/reference/{corpus}/train.txt", doc_id="t"
    ).persist()
    val = read_conll(
        spark, f"/root/reference/{corpus}/validation.txt", doc_id="v"
    ).persist()
    val.count()

    t0 = time.time()
    if mode == "extended":
        from hmm_crf_ner_fromscratch_spark.functions.crf import EXTENDED_U_TEMPLATES

        registry = build_registry(train, u_templates=EXTENDED_U_TEMPLATES)
    elif mode in ("cluster", "gaz"):
        from hmm_crf_ner_fromscratch_spark.functions.crf import (
            cluster_u_templates,
            gazetteer_u_templates,
            register_cluster_maps,
        )
        from hmm_crf_ner_fromscratch_spark.operators.clusters import (
            prefix_maps,
            train_word_clusters,
        )
        from hmm_crf_ner_fromscratch_spark.operators.crf import mine_gazetteer

        # cluster hyperparameters via env (positional argv is full)
        min_count = int(os.environ.get("CLUSTER_MIN_COUNT", "1"))
        depth = int(os.environ.get("CLUSTER_DEPTH", "10"))
        grans = tuple(
            int(g)
            for g in os.environ.get("CLUSTER_GRANULARITIES", "4,6,10").split(",")
        )
        bigrams = os.environ.get("CLUSTER_BIGRAMS", "1") == "1"
        bits = train_word_clusters(train, min_count=min_count, depth=depth)
        cmaps = prefix_maps(bits, lengths=grans)
        tpls = cluster_u_templates(
            tuple(f"c{g}" for g in grans), include_bigrams=bigrams
        )
        if mode == "gaz":
            # GAZ_MIN_COUNT > 1 masks singleton entity words at TRAIN time
            # only (they read '<unk>', like validation-unseen entities do),
            # while evaluation and every saved checkpoint carry the full
            # map -- see mine_gazetteer's docstring for the measured
            # recall-collapse this prevents.
            gaz_min_count = int(os.environ.get("GAZ_MIN_COUNT", "1"))
            full_gaz = mine_gazetteer(train)
            cmaps["gaz"] = (
                mine_gazetteer(train, min_count=gaz_min_count)
                if gaz_min_count > 1
                else full_gaz
            )
            tpls = gazetteer_u_templates(tpls)
        # round-6 single lever: a word-shape TRIGRAM conjunction
        # (-1,0,1) -- capitalization-pattern sequences ("Xx Xx Xx") fire
        # on wholly unseen names, targeting the recall deficit (r 0.875
        # vs p 0.896 on the round-5 record run)
        if os.environ.get("SHAPE_TRIGRAM", "0") == "1":
            tpls = tpls + [("UST", (-1, 0, 1), "shape")]
        register_cluster_maps(cmaps)
        print(
            f"clusters: V={len(bits)}, min_count={min_count}, depth={depth}, "
            f"grans={grans}, bigrams={bigrams}, "
            f"gaz={len(cmaps.get('gaz', {}))}"
            + (
                f" (train-masked; full={len(full_gaz)})"
                if mode == "gaz" and gaz_min_count > 1
                else ""
            )
            + f", {time.time()-t0:.0f}s",
            flush=True,
        )
        registry = build_registry(train, u_templates=tpls)
        registry.cluster_maps = cmaps
    else:
        registry = build_registry(train)
    print(
        f"registry[{mode}]: {registry.n_features} features, {time.time()-t0:.0f}s",
        flush=True,
    )

    def evaluate(model):
        decoded = decode_crf(val.drop("tags"), model).select("sent_id", "tags_pred")
        j = decoded.join(val.select("sent_id", "tags"), "sent_id")
        pairs = j.select(
            F.explode(
                F.arrays_zip(F.col("tags_pred").alias("p"), F.col("tags").alias("g"))
            ).alias("x")
        ).select(F.col("x.p").alias("p"), F.col("x.g").alias("g"))
        agg = pairs.agg(
            F.avg((F.col("p") == F.col("g")).cast("double")).alias("acc"),
            F.sum(((F.col("p") == F.col("g")) & (F.col("g") != "O")).cast("long")).alias("tp"),
            F.sum(((F.col("p") != F.col("g")) & (F.col("p") != "O")).cast("long")).alias("fp"),
            F.sum(((F.col("p") != F.col("g")) & (F.col("g") != "O")).cast("long")).alias("fn"),
        ).first()
        prec = agg.tp / max(agg.tp + agg.fp, 1)
        rec = agg.tp / max(agg.tp + agg.fn, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-12)
        return {"token_acc": agg.acc, "micro_p": prec, "micro_r": rec, "micro_f1": f1}

    avg_from = int(sys.argv[6]) if len(sys.argv) > 6 else 0

    log_path = os.path.join(out_dir, "log.jsonl")
    best = {"f1": -1.0}
    avg = {"sum": None, "n": 0}

    def cb(epoch, model, loss):
        import numpy as np

        if mode == "gaz":
            # train_crf's model broadcast is taken at entry (before epoch
            # 1), so from the first callback on the driver copy can carry
            # the deployment (full) gazetteer: every eval and checkpoint
            # below then measures/ships exactly what decode will see,
            # while the in-flight training keeps the masked broadcast.
            model.cluster_maps["gaz"] = full_gaz

        rec = {"epoch": epoch, "loss": loss, "sec": round(time.time() - t0, 1)}
        if avg_from and epoch >= avg_from:
            w = model.weights.astype(np.float64)
            avg["sum"] = w if avg["sum"] is None else avg["sum"] + w
            avg["n"] += 1
        if epoch % 3 == 0 or epoch == epochs:
            rec.update(evaluate(model))
            model.save(os.path.join(out_dir, "model"))
            # validation F1 oscillates across epochs (measured: 0.748@9 ->
            # 0.719@12 -> 0.787@15); retain the best checkpoint separately
            if rec["micro_f1"] > best["f1"]:
                best["f1"] = rec["micro_f1"]
                model.save(os.path.join(out_dir, "model_best"))
                rec["best"] = True
        with open(log_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)

    model, losses = train_crf(
        train, model=registry, epochs=epochs, lr=lr, l2=l2,
        optimizer="adagrad", epoch_callback=cb,
    )
    model.save(os.path.join(out_dir, "model"))
    final = evaluate(model)
    print("FINAL", final, flush=True)
    with open(log_path, "a", encoding="utf-8") as f:
        f.write(json.dumps({"final": final}) + "\n")
    if avg_from and avg["n"]:
        import numpy as np

        model.weights = (avg["sum"] / avg["n"]).astype(np.float32)
        model.save(os.path.join(out_dir, "model_avg"))
        favg = evaluate(model)
        print(f"FINAL_AVG (epochs {avg_from}..{epochs})", favg, flush=True)
        with open(log_path, "a", encoding="utf-8") as f:
            f.write(json.dumps({"final_avg": favg, "avg_from": avg_from}) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()

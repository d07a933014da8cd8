"""Interactive evaluation CLI -- drop-in for the reference's ``check.py``
prompt flow (check.py:44-67), driving the oracle-verified Spark
evaluation instead of sklearn (absent from this environment).

Same contract as the reference: the user picks a model number, a
dataset split, and a language; the tool then reads the GOLD file
``{language}/{dataset}.txt`` and the PREDICTION file
``{language}/{dataset}_{model}.txt`` (positional line alignment, the
reference's loop at check.py:25-37) from ``--root`` (default: cwd,
matching the reference's relative paths) and prints a
classification-report table over the fixed label list
(check.py:6-17; per-label rows + micro/macro/weighted averages,
4-digit display).

Metric semantics are operators/evaluation.py::classification_report --
sklearn fixed-label-list behavior replicated exactly and hash-verified
against the DuckDB oracle (entry query ``eval_report``); the table
layout follows sklearn's documented text format so existing eyeballs
and diff scripts keep working.

Usage:
  python tools/check_cli.py [--root DIR]            # interactive
  python tools/check_cli.py MODEL DATASET LANGUAGE [--root DIR]
    e.g. python tools/check_cli.py 1 v e --root /data/conll
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's fixed label lists (check.py:6-17) -- order matters:
# it pins row order and the macro-average denominator
SORTED_LABELS_ENG = [
    "O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC",
    "B-MISC", "I-MISC",
]
SORTED_LABELS_CHN = ["O"] + [
    f"{p}-{t}"
    for t in ("NAME", "CONT", "EDU", "TITLE", "ORG", "RACE", "PRO", "LOC")
    for p in ("B", "M", "E", "S")
]


def render_report(rows, labels: list[str], digits: int = 4) -> str:
    """sklearn classification_report text layout (documented public
    format): right-aligned label column sized to the longest name,
    9-wide metric columns, blank line before the average rows."""
    averages = ["micro avg", "macro avg", "weighted avg"]
    width = max(len(x) for x in labels + averages)
    head_fmt = "{:>{width}s} " + " {:>9}" * 3 + " {:>9}"
    row_fmt = "{:>{width}s} " + " {:>9.{digits}f}" * 3 + " {:>9}"
    lines = [head_fmt.format(
        "", "precision", "recall", "f1-score", "support", width=width)]
    lines.append("")
    by_idx = {r.label_idx: r for r in rows}
    n = len(labels)
    for i, lab in enumerate(labels):
        r = by_idx[i]
        lines.append(row_fmt.format(
            lab, r.precision, r.recall, r.f1, r.support,
            width=width, digits=digits))
    lines.append("")
    for j, name in enumerate(averages):
        r = by_idx[n + j]
        lines.append(row_fmt.format(
            name, r.precision, r.recall, r.f1, r.support,
            width=width, digits=digits))
    lines.append("")
    return "\n".join(lines)


def check(language: str, gold_path: str, my_path: str, spark=None) -> str:
    from hmm_crf_ner_fromscratch_spark.operators.evaluation import (
        classification_report,
    )
    from hmm_crf_ner_fromscratch_spark.session import get_spark
    from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll

    labels = (
        SORTED_LABELS_ENG if language == "English" else SORTED_LABELS_CHN
    )
    spark = spark or get_spark(app_name="check-cli")
    gold = read_conll(spark, gold_path, doc_id="g")
    # same doc_id key -> positional J1 alignment; the pairs operator
    # expects the prediction frame's tag column as ``tags_pred``
    pred = read_conll(spark, my_path, doc_id="g").withColumnRenamed(
        "tags", "tags_pred"
    )
    rows = classification_report(gold, pred, labels[1:]).collect()
    return render_report(rows, labels[1:])


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    root = "."
    if "--root" in argv:
        i = argv.index("--root")
        root = argv[i + 1]
        del argv[i : i + 2]

    if len(argv) >= 3:
        model, dataset, language = argv[0], argv[1], argv[2]
    else:
        # the reference's prompt flow, verbatim strings (check.py:44-67)
        model = input("Model (1/2/3): ")
        while model not in ["1", "2", "3"]:
            print("Invalid model. Please choose 1, 2, 3.")
            model = input("Model (1/2/3): ")

        dataset = input("Dataset (t->train/v->validation/test): ")
        while dataset not in ["t", "v", "test"]:
            print("Invalid dataset. Please choose t, v or test.")
            dataset = input("Dataset (t->train/v->validation/test): ")

        language = input("Language (e->English/c->Chinese): ")
        while language not in ["e", "c"]:
            print("Invalid language. Please choose e or c.")
            language = input("Language (e->English/c->Chinese): ")

    if dataset == "t":
        dataset = "train"
    elif dataset == "v":
        dataset = "validation"
    language = {"e": "English", "c": "Chinese"}.get(language, language)

    print(
        f"--------------------------------Test Model {model}"
        "--------------------------------"
    )
    print(f"{language} {dataset.title()} Set:")
    print(
        check(
            language=language,
            gold_path=os.path.join(root, language, f"{dataset}.txt"),
            my_path=os.path.join(root, language, f"{dataset}_{model}.txt"),
        )
    )


if __name__ == "__main__":
    main()
